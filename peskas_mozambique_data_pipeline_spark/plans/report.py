"""Corpus card: the data-sheet summary of a curation run.

``run_corpus_pipeline`` returns {zone → versioned path}; this plan
reduces that run to ONE small tidy frame — per-zone row counts, token
and character totals where the zone is document-shaped, and
stage-over-stage row retention — the table a corpus release publishes
next to its artifacts ("Datasheets for Datasets", Gebru et al. 2021;
every public corpus paper's Table 1).

Reference parity: the same run-summary role as the reference's
``export_*`` metrics tables (R/export-models-data.R) — generalized to
the curation DAG's zones instead of fishery metrics.

Scale shape: one distributed aggregate per zone (count + two sums —
map-side combinable, no shuffle beyond the 1-row agg), unioned into a
zone-count-sized frame (≤ ~18 rows); the retention window runs on
those rows, never on data.  Nothing collects corpus rows to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import token_count

# canonical DAG order (matches run_corpus_pipeline's stage sequence);
# zones absent from a run are simply skipped
ZONE_ORDER = [
    "corpus_ingested",
    "corpus_extracted",
    "corpus_normalized",
    "corpus_url_deduped",
    "corpus_filtered",
    "corpus_classified",
    "corpus_lang_segmented",
    "corpus_line_scrubbed",
    "corpus_decontaminated",
    "corpus_deduped",
    "corpus_semantic",
    "corpus_scrubbed",
    "corpus_diverse",
    "corpus_augmented",
    "corpus_packs",
    "corpus_shuffled",
    "training_shards",
    "sequence_layout",
]


def corpus_card(
    spark: SparkSession,
    zone_paths: dict[str, str],
    text_col: str = "text",
) -> DataFrame:
    """One row per executed zone, in DAG order: ``(pos, zone, n_rows,
    n_tokens, n_chars, retained_rows_permille)``.

    ``n_tokens``/``n_chars`` are NULL for zones that are not
    document-shaped (packs, shards, sequence layouts).  Retention is
    rows-vs-previous-zone in exact integer permille — across a shape
    boundary (docs → packs) it reports the row-count ratio, which is
    still the fan-in a release card states.  Ordering literals come
    from ``ZONE_ORDER``, so the card is deterministic for any dict
    ordering of the input.
    """
    return corpus_card_frames(
        {
            zone: spark.read.parquet(path)
            for zone, path in zone_paths.items()
            if zone in ZONE_ORDER
        },
        text_col=text_col,
    )


def corpus_card_frames(
    zone_frames: dict[str, DataFrame],
    text_col: str = "text",
) -> DataFrame:
    """The card arithmetic over already-loaded zone frames — the core
    :func:`corpus_card` wraps with parquet reads, split out so the
    hard-oracle row (``pca``-style staged query ``corpus_card``) can
    exercise the EXACT aggregation + retention chain on analytic zone
    frames without a filesystem run."""
    frames = []
    for pos, zone in enumerate(ZONE_ORDER):
        df = zone_frames.get(zone)
        if df is None:
            continue
        if text_col in df.columns:
            toks = F.sum(token_count(F.col(text_col))).cast("long")
            chars = F.sum(F.length(text_col)).cast("long")
        else:
            toks = F.lit(None).cast("long")
            chars = F.lit(None).cast("long")
        frames.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                toks.alias("n_tokens"),
                chars.alias("n_chars"),
            ).select(
                F.lit(pos).cast("int").alias("pos"),
                F.lit(zone).alias("zone"),
                "n_rows",
                "n_tokens",
                "n_chars",
            )
        )
    if not frames:
        raise ValueError("no known zones in zone_paths")
    card = frames[0]
    for f in frames[1:]:
        card = card.unionByName(f)
    # ≤ ~18 rows: the single-partition ordering window is zone-count
    # sized, never data-sized
    w = Window.orderBy("pos")
    prev = F.lag("n_rows").over(w)
    # exact integer floor: (a - a % b) / b is divisible, so the double
    # division is exact (permille values are small)
    scaled = F.col("n_rows") * 1000
    return card.withColumn(
        "retained_rows_permille",
        F.when(
            prev.isNotNull() & (prev > 0), (scaled - scaled % prev) / prev
        ).cast("long"),
    )
