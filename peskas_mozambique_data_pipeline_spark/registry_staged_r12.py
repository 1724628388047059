"""Round-12 STAGED registry rows — the NOTES pre-staging recipe
applied one round further out, so r12 registration starts from
bit-exact two-scale-factor evidence just like r10's and r11's swaps
did (``tests/test_registry_staged_r12.py``).

Window/ceiling arithmetic: the r11 recipe lands the registry at 98
with 2 slots of headroom under the 100 ceiling, so r12 can register
up to two NEW rows before another consolidation is required.

* ``diversity_sample`` puts cluster-balanced diversity sampling
  (``operators.curation.cluster_balanced_sample`` — the DataComp-style
  keep-the-topic-mix budget sampler) under the hard oracle.  Strata
  are nearest-centroid assignments against the FIXED ``vec_id < 8``
  shared-centroid table (the ``drift_audit`` discipline: no k-means
  replay, one assignment pass), quality is analytic
  (``(vec_id·37+11) mod 997``), the budget is a literal 120 — a real
  constraint at every SF (embeddings: 500/500/2000 rows).  The oracle
  replays the assignment, the largest-remainder (Hamilton)
  apportionment in BIGINT arithmetic, and the per-cluster quality
  top-k; any drift in apportionment rounding, leftover-seat ranking
  or tie-breaks hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIVERSITY_BUDGET = 120


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import cluster_balanced_sample
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    docs = emb.select(
        "vec_id",
        "embedding",
        ((F.col("vec_id") * 37 + 11) % 997).cast("long").alias("quality"),
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    out = cluster_balanced_sample(
        docs, cents, budget=_DIVERSITY_BUDGET, quality_col="quality",
        id_col="vec_id",
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("int").alias("centroid_id"),
        F.col("quality").cast("long").alias("quality"),
    )


def _sql_diversity_sample() -> str:
    from .registry_text import _sql_dot, _sql_norm

    cos = (
        f"({_sql_dot('e.embedding', 'c.centroid')}"
        f" / ({_sql_norm('e.embedding')} * {_sql_norm('c.centroid')}))"
    )
    b = _DIVERSITY_BUDGET
    return f"""
WITH cents AS (
  SELECT CAST(vec_id AS INTEGER) AS centroid_id, embedding AS centroid
  FROM embeddings WHERE vec_id < 8
),
assign AS (
  SELECT vec_id, quality, centroid_id FROM (
    SELECT e.vec_id, CAST((e.vec_id * 37 + 11) % 997 AS BIGINT) AS quality,
           c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.centroid_id) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
counts AS (SELECT centroid_id, COUNT(*) AS n FROM assign GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
q AS (
  SELECT centroid_id, n,
         CAST({b} AS BIGINT) * n // t AS quota,
         CAST({b} AS BIGINT) * n % t AS rem
  FROM counts, tot
),
qs AS (SELECT CAST(SUM(quota) AS BIGINT) AS qsum FROM q),
alloc AS (
  SELECT centroid_id,
         quota + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, centroid_id)
                           <= CAST({b} AS BIGINT) - qsum
                      THEN 1 ELSE 0 END AS alloc
  FROM q, qs
),
ranked AS (
  SELECT a.vec_id, a.centroid_id, a.quality, al.alloc,
         ROW_NUMBER() OVER (
           PARTITION BY a.centroid_id
           ORDER BY a.quality DESC, a.vec_id) AS rn
  FROM assign a JOIN alloc al ON a.centroid_id = al.centroid_id
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(centroid_id AS INTEGER) AS centroid_id,
       CAST(quality AS BIGINT) AS quality
FROM ranked WHERE rn <= alloc
"""


STAGED_QUERIES = {
    "diversity_sample": q_diversity_sample,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "diversity_sample": _sql_diversity_sample(),
    }


# names each staged consolidation row replaces at registration time
# (none yet — r12 has 2 slots of post-r11 headroom for new rows)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
