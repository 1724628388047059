"""Round-13 STAGED registry row — pre-staged two rounds out because
its evidence is ready now (the NOTES pre-staging recipe; the r12
module's ceiling arithmetic means any r13 addition must be FUNDED by a
consolidation chosen from whatever tail actually rotates into r13 —
that pairing is deliberately left to the r12-close session, which can
see the window).

* ``pca_cov`` puts the exact-covariance surface
  (``operators.similarity.covariance_cells`` — the distributed half
  of ``embedding_pca``) under the hard oracle: integer-quantized
  component products summed as DECIMAL(38,0) over the upper triangle.
  The oracle replays the identical arithmetic with HUGEINT sums —
  any drift in quantization rounding, triangle masking or the
  partial-aggregation fold hash-mismatches.  Because the sums are
  exact integers in BOTH engines, this row is immune to the float
  reduction-order class entirely.

* ``audio_fp`` puts the acoustic fingerprint
  (``operators.multimodal.audio_fingerprint`` — Haitsma–Kalker
  energy-delta signs packed into 56-bit words, the audio tier of the
  perceptual-hash family) under the hard oracle on analytically
  synthesized PCM (the ``audio_audit`` discipline; lengths straddle
  the sub-window single-frame branch, which must yield NO fingerprint
  rows, and the multi-word boundary).  The oracle replays framing,
  exact-integer energies, the LEAD delta-sign bit and the low-bit-
  first shift packing in DuckDB; every quantity is an exact integer,
  so the row is immune to the float class entirely.  The banding-pair
  half of the audio near-dup surface reuses the machinery
  ``image_dups`` already hash-verifies.

* ``corpus_card`` (VERDICT r10 Next #6) puts the data-sheet card
  arithmetic (``plans.report.corpus_card_frames`` — per-zone
  count/token/char aggregates + the exact-integer permille retention
  window) under the hard oracle.  Zone frames are ANALYTIC views of
  ``documents`` (ingest → length filter → mod-key scrub → pack
  rollup), so the oracle replays every zone's defining predicate, the
  whitespace token count, and the ``(a − a % b)/b`` floor-division
  permille in plain SQL; the ``pos`` ordering literals are generated
  from ``ZONE_ORDER`` on BOTH sides so the card's DAG ordering cannot
  drift from the staged SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.report import ZONE_ORDER


def q_pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import covariance_cells
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cells = covariance_cells(emb, vec_col="embedding", quant=10**6)
    # exact integers travel as DIGIT STRINGS on both sides: DECIMAL vs
    # HUGEINT never enters the cross-engine type comparison
    return cells.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("s").cast("decimal(38,0)").cast("string").alias("s"),
    )


SQL_PCA_COV = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
cells AS (
  SELECT i.i AS i, j.j AS j,
         CAST(q.qv[i.i + 1] AS HUGEINT) * q.qv[j.j + 1] AS p
  FROM q,
       UNNEST(generate_series(0, len(qv) - 1)) AS i(i),
       UNNEST(generate_series(0, len(qv) - 1)) AS j(j)
  WHERE j.j >= i.i
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       CAST(SUM(p) AS VARCHAR) AS s
FROM cells GROUP BY i, j
"""


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.report import corpus_card_frames
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # analytic zone chain: each zone is a deterministic view of the one
    # before it, so retention permilles are exactly replayable.  The
    # upstream operators these stand in for (quality filter, scrub,
    # packing) each carry their OWN registry rows — this row verifies
    # the CARD arithmetic over the zone frames.
    filtered = docs.filter(F.length("text") >= 50)
    deduped = filtered.filter(F.col("doc_id") % 7 != 0)
    packs = deduped.groupBy((F.col("doc_id") % 8).alias("pack_id")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    card = corpus_card_frames(
        {
            "corpus_ingested": docs,
            "corpus_filtered": filtered,
            "corpus_deduped": deduped,
            "corpus_packs": packs,
        }
    )
    return card.select(
        "pos", "zone", "n_rows", "n_tokens", "n_chars",
        "retained_rows_permille",
    )


def _sql_corpus_card() -> str:
    pos = {z: ZONE_ORDER.index(z) for z in (
        "corpus_ingested", "corpus_filtered", "corpus_deduped", "corpus_packs"
    )}
    ntok = r"SUM(len(string_split_regex(trim(text), '\s+')))"
    return f"""
WITH ingested AS (SELECT doc_id, text FROM documents),
filtered AS (SELECT * FROM ingested WHERE length(text) >= 50),
deduped AS (SELECT * FROM filtered WHERE doc_id % 7 <> 0),
packs AS (SELECT doc_id % 8 AS pack_id, COUNT(*) AS n_docs
          FROM deduped GROUP BY 1),
zones AS (
  SELECT {pos['corpus_ingested']} AS pos, 'corpus_ingested' AS zone,
         COUNT(*) AS n_rows, {ntok} AS n_tokens,
         SUM(length(text)) AS n_chars
  FROM ingested
  UNION ALL
  SELECT {pos['corpus_filtered']}, 'corpus_filtered',
         COUNT(*), {ntok}, SUM(length(text))
  FROM filtered
  UNION ALL
  SELECT {pos['corpus_deduped']}, 'corpus_deduped',
         COUNT(*), {ntok}, SUM(length(text))
  FROM deduped
  UNION ALL
  SELECT {pos['corpus_packs']}, 'corpus_packs',
         COUNT(*), NULL, NULL
  FROM packs
)
SELECT CAST(pos AS INTEGER) AS pos, zone,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN prev IS NOT NULL AND prev > 0 THEN
              (n_rows * 1000 - (n_rows * 1000) % prev) / prev
            END AS BIGINT) AS retained_rows_permille
FROM (SELECT *, LAG(n_rows) OVER (ORDER BY pos) AS prev FROM zones)
"""


def q_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import audio_fingerprint
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    # lengths 100..4900: vec_id % 7 == 0 rows (n=100 < win=160) hit the
    # single-frame branch and must emit NO fingerprint; the longest hit
    # 60 frames = 59 bits -> two 56-bit words
    n = (100 + (F.col("vec_id") % 7) * 800).cast("int")
    samples = F.transform(
        F.sequence(F.lit(1), n),
        lambda j: (
            ((F.col("vec_id") * 7 + j.cast("long") * 13) % 201) - 100
        ).cast("long"),
    )
    pcm = emb.select("vec_id", samples.alias("samples"))
    out = audio_fingerprint(
        pcm, samples_col="samples", id_col="vec_id",
        window_ms=10, hop_ms=5, sample_rate=16_000, bits_per_word=56,
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("word_idx").cast("long").alias("word_idx"),
        F.col("fp").cast("long").alias("fp"),
    )


SQL_AUDIO_FP = """
WITH pcm AS (
  SELECT vec_id, CAST(100 + (vec_id % 7) * 800 AS BIGINT) AS n,
         list_transform(
           generate_series(1, CAST(100 + (vec_id % 7) * 800 AS BIGINT)),
           j -> CAST(((vec_id * 7 + j * 13) % 201) - 100 AS BIGINT)) AS s
  FROM embeddings
),
f AS (
  SELECT vec_id, s,
         CASE WHEN n >= 160 THEN (n - 160) // 80 + 1 ELSE 1 END AS nf,
         CASE WHEN n >= 160 THEN 160 ELSE n END AS fl
  FROM pcm
),
frames AS (
  SELECT vec_id, fi,
         list_reduce(list_transform(s[fi * 80 + 1 : fi * 80 + fl],
                                    x -> x * x), (a, b) -> a + b) AS energy
  FROM f, UNNEST(generate_series(0, CAST(nf - 1 AS BIGINT))) AS t(fi)
),
bits AS (
  SELECT vec_id, fi AS seq,
         LEAD(energy) OVER (PARTITION BY vec_id ORDER BY fi) AS nxt,
         energy
  FROM frames
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(seq // 56 AS BIGINT) AS word_idx,
       CAST(SUM(CASE WHEN nxt > energy THEN 1 ELSE 0 END
                * (CAST(1 AS BIGINT) << CAST(seq % 56 AS INTEGER)))
            AS BIGINT) AS fp
FROM bits
WHERE nxt IS NOT NULL
GROUP BY vec_id, seq // 56
"""


STAGED_QUERIES = {
    "pca_cov": q_pca_cov,
    "audio_fp": q_audio_fp,
    "corpus_card": q_corpus_card,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "pca_cov": SQL_PCA_COV,
        "audio_fp": SQL_AUDIO_FP,
        "corpus_card": _sql_corpus_card(),
    }


# funding consolidation chosen at r12 close (see module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
