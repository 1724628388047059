"""Round-16 STAGED registry row — pre-staged because its evidence is
ready now (the NOTES pre-staging recipe; the registry sits AT the 100
ceiling, so the row registers only with a funding consolidation chosen
by the session that can see the r16 tail).

* ``hdr_audit`` puts the mergeable-quantile sketch
  (``operators/sketches.py::hdr_histogram/hdr_quantiles``) under the
  hard oracle.  Two legs over lineitem's price in exact integer cents:
  every HDR bucket (id, lower bound, count — msb via ``length(bin)``,
  shift arithmetic only, the HLL rho trick) and the p50/p95/p99
  estimates (the exact integer lower bound of the first bucket whose
  cumulative count reaches ceil(q·n)).  The Spark side additionally
  goes the long way around — per-RETURNFLAG histograms SUM-merged down
  to the global one (``hdr_merge``) — so the value-independent-
  boundaries monoid claim is itself under the hash.  Integer
  arithmetic end to end: zero float boundary anywhere (the quantile
  targets ceil(q·n) use exact dyadic q literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_L = "long"
_D = "double"

_HDR_SB = 5
_HDR_QS = (0.5, 0.95, 0.99)


def q_hdr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches as sk
    from .session import read_table

    line = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    # the long way: per-flag histograms -> SUM-merge to global (the
    # monoid must be lossless for the legs to hash-match the oracle's
    # direct global computation)
    per_flag = sk.hdr_histogram(line, "v", ["grp"], sub_bits=_HDR_SB)
    merged = sk.hdr_merge(per_flag)
    buckets = merged.select(
        F.lit("bucket").alias("stat"),
        F.col("bucket").cast(_L).alias("bucket"),
        F.col("lo").cast(_L).alias("lo"),
        F.col("n").cast(_L).alias("n"),
        F.lit(None).cast(_D).alias("quantile"),
    )
    qs = sk.hdr_quantiles(merged, list(_HDR_QS)).select(
        F.lit("q").alias("stat"),
        F.lit(None).cast(_L).alias("bucket"),
        F.col("estimate").cast(_L).alias("lo"),
        F.lit(None).cast(_L).alias("n"),
        F.col("quantile").cast(_D).alias("quantile"),
    )
    return buckets.unionByName(qs)


SQL_HDR_AUDIT = f"""
WITH v AS (
  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v FROM lineitem
  WHERE l_extendedprice IS NOT NULL
),
b AS (
  SELECT v, length(bin(v)) AS m,
         GREATEST(0, length(bin(v)) - {1 + _HDR_SB}) AS s
  FROM v WHERE v >= 0
),
hist AS (
  SELECT CASE WHEN v = 0 THEN 0
              ELSE m * {1 << (_HDR_SB + 1)} + (v >> s) END AS bucket,
         CASE WHEN v = 0 THEN 0 ELSE (v >> s) << s END AS lo,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY 1, 2
),
cum AS (
  SELECT bucket, lo, n,
         SUM(n) OVER (ORDER BY bucket) AS c,
         SUM(n) OVER () AS t
  FROM hist
),
qpick AS (
  SELECT q.q AS quantile, MIN(lo) AS est
  FROM cum, (SELECT UNNEST([0.5, 0.95, 0.99]) AS q) q
  WHERE c >= GREATEST(1, CEIL(q.q * t)) AND c - n < GREATEST(1, CEIL(q.q * t))
  GROUP BY q.q
)
SELECT 'bucket' AS stat, CAST(bucket AS BIGINT) AS bucket,
       CAST(lo AS BIGINT) AS lo, CAST(n AS BIGINT) AS n,
       CAST(NULL AS DOUBLE) AS quantile
FROM hist
UNION ALL
SELECT 'q', CAST(NULL AS BIGINT), CAST(est AS BIGINT),
       CAST(NULL AS BIGINT), CAST(quantile AS DOUBLE)
FROM qpick
"""


STAGED_QUERIES = {
    "hdr_audit": q_hdr_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "hdr_audit": SQL_HDR_AUDIT,
    }


# funding consolidation chosen at r15/r16 close (see module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
