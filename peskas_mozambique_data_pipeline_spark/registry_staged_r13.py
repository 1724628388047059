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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


STAGED_QUERIES = {
    "pca_cov": q_pca_cov,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "pca_cov": SQL_PCA_COV,
    }


# funding consolidation chosen at r12 close (see module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
