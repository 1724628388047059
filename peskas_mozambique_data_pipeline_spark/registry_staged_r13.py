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


STAGED_QUERIES = {
    "pca_cov": q_pca_cov,
    "corpus_card": q_corpus_card,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "pca_cov": SQL_PCA_COV,
        "corpus_card": _sql_corpus_card(),
    }


# funding consolidation chosen at r12 close (see module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
