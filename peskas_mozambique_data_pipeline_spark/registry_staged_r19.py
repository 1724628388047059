"""Round-19 STAGED registry rows — pre-staged five rounds out with
full evidence (the r13-close discipline extended; the registry sits
AT the 100 ceiling, so rows register only with funding consolidations
made WITHIN the r19 rotating-in set).

* ``skewjoin_audit`` puts the skew toolkit's deterministic salted
  join (``operators/skew.py::salted_join``) under the hard oracle.
  The big side is lineitem with an ANALYTIC hot key (every
  ``l_suppkey % 3 == 0`` row collapses onto key 0 — a third of the
  table on one key at every SF, the straggler shape the salt
  exists for); the dim side is the distinct-key frame with an
  arithmetic attribute.  The salted join's output is
  aggregate-verified (per-group exact cent sums + counts), so the
  oracle — a PLAIN SQL join + groupBy — certifies the load-bearing
  contract: salting never changes the relation, only the shuffle.
  The salt itself is derived (xxhash64) but salt-free in the output
  by construction.

* ``saltagg_audit`` does the same for two-phase aggregation
  (``salted_agg``): orders fold onto an analytic hot key (half the
  table on one key), all four supported monoids (count / sum / max /
  min) in one pass, partials re-folded per key.  Oracle = the plain
  grouped aggregate.

FOUR r19 registrations → two funding consolidations, both staged
HERE with evidence.  All four legs sit in the CURRENT r14 head
(cohort A: verified r14, resting r15, verified r16, resting r17,
verified r18 — rotating into the r19 head), so both unions are made
WITHIN r19's rotating-in set:

* ``sketchall_audit`` = ``sketchfam_audit`` + ``kmv_audit`` (the
  sketch family: HLL/CMS/histogram replays + the KMV bottom-k rows —
  sketchfam is itself a union of two legs, the
  crawlfam-inside-webfam precedent);
* ``embfam_audit`` = ``ann_lsh`` + ``embedding_clusters`` (the
  embedding family: LSH-bucketed ANN + cosine-threshold connected
  components).

Arithmetic: r19 head = 50 − 4 legs + 2 unions + 2 funded = 50; the
registry stays AT the 100 ceiling.  Every row below carries bit-exact
sf0.001 + sf0.01 pytest evidence (tests/test_registry_staged_r19.py)
plus the sf0.1 local[8] / sf0.01 local[3] determinism matrix recorded
at r14 close (NOTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"

_N_SALTS = 8


def q_skewjoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_join
    from .session import read_table

    li = read_table(spark, sf_dir, "lineitem")
    sk = F.when(F.col("l_suppkey") % 3 == 0, F.lit(0)).otherwise(
        F.col("l_suppkey")
    )
    big = li.select(
        sk.cast(_L).alias("sk"),
        (F.round(F.col("l_extendedprice") * 100).cast(_L)
         * (F.lit(100) - F.round(F.col("l_discount") * 100).cast(_L))
         ).alias("rev_c"),
        F.round(F.col("l_quantity") * 100).cast(_L).alias("qty_c"),
    )
    dim = (
        big.select("sk").distinct().withColumn("grp", F.col("sk") % 25)
    )
    joined = salted_join(big, dim, on="sk", n_salts=_N_SALTS)
    return (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("rev_c").alias("rev_c"),
            F.sum("qty_c").alias("qty_c"),
        )
        .select(
            F.col("grp").cast(_L).alias("grp"),
            F.col("n_rows").cast(_L).alias("n_rows"),
            (F.col("rev_c") / 10000.0).alias("revenue"),
            (F.col("qty_c") / 100.0).alias("total_qty"),
        )
    )


SQL_SKEWJOIN_AUDIT = """
WITH big AS (
  SELECT CASE WHEN l_suppkey % 3 = 0 THEN 0 ELSE l_suppkey END AS sk,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
  FROM lineitem
),
dim AS (SELECT DISTINCT sk, sk % 25 AS grp FROM big)
SELECT CAST(d.grp AS BIGINT) AS grp, COUNT(*) AS n_rows,
       SUM(b.rev_c) / 10000.0 AS revenue,
       SUM(b.qty_c) / 100.0 AS total_qty
FROM big b JOIN dim d ON b.sk = d.sk
GROUP BY d.grp
"""


def q_saltagg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_agg
    from .session import read_table

    orders = read_table(spark, sf_dir, "orders")
    hot = F.when(F.col("o_custkey") % 2 == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("c"), (F.col("o_custkey") % 11).cast(_S))
    )
    df = orders.select(
        hot.alias("hot"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100).cast(_L).alias("cents"),
    )
    out = salted_agg(
        df,
        ["hot"],
        {
            "n": ("count", "okey"),
            "cents": ("sum", "cents"),
            "mx": ("max", "cents"),
            "mn": ("min", "cents"),
        },
        n_salts=_N_SALTS,
    )
    return out.select(
        F.col("hot").cast(_S).alias("hot"),
        F.col("n").cast(_L).alias("n"),
        F.col("cents").cast(_L).alias("cents"),
        F.col("mx").cast(_L).alias("mx"),
        F.col("mn").cast(_L).alias("mn"),
    )


SQL_SALTAGG_AUDIT = """
SELECT CASE WHEN o_custkey % 2 = 0 THEN 'hot'
            ELSE 'c' || CAST(o_custkey % 11 AS VARCHAR) END AS hot,
       COUNT(o_orderkey) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx,
       MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS mn
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# funding consolidations (legs verbatim, CTE-wrapped SQL)


def q_sketchall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_r12 import q_kmv_audit
    from .registry_staged_r12 import q_sketchfam_audit

    a = q_sketchfam_audit(spark, sf_dir).select(
        F.lit(None).cast(_S).alias("tbl"),
        F.col("stat").cast(_S).alias("stat"),
        F.col("key1").cast(_S).alias("k1"),
        F.lit(None).cast(_L).alias("pos"),
        F.lit(None).cast(_L).alias("hv"),
        F.col("q").cast(_D).alias("q"),
        F.col("n_exact").cast(_L).alias("n"),
        F.col("estimate").cast(_D).alias("v"),
    )
    b = q_kmv_audit(spark, sf_dir).select(
        F.col("tbl").cast(_S).alias("tbl"),
        F.col("stat").cast(_S).alias("stat"),
        F.col("grp").cast(_S).alias("k1"),
        F.col("pos").cast(_L).alias("pos"),
        F.col("hv").cast(_L).alias("hv"),
        F.lit(None).cast(_D).alias("q"),
        F.lit(None).cast(_L).alias("n"),
        F.col("est").cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_sketchall_audit() -> str:
    from .registry_r12 import SQL_KMV_AUDIT
    from .registry_staged_r12 import _sql_sketchfam_audit

    return f"""
WITH a AS ({_sql_sketchfam_audit()}),
b AS ({SQL_KMV_AUDIT})
SELECT CAST(NULL AS VARCHAR) AS tbl, stat, CAST(key1 AS VARCHAR) AS k1,
       CAST(NULL AS BIGINT) AS pos, CAST(NULL AS BIGINT) AS hv,
       CAST(q AS DOUBLE) AS q, CAST(n_exact AS BIGINT) AS n,
       CAST(estimate AS DOUBLE) AS v
FROM a
UNION ALL
SELECT CAST(tbl AS VARCHAR), stat, CAST(grp AS VARCHAR),
       CAST(pos AS BIGINT), CAST(hv AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS BIGINT), CAST(est AS DOUBLE)
FROM b
"""


def q_embfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import q_ann_lsh, q_embedding_clusters

    a = q_ann_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("stat"),
        F.col("query_id").cast(_L).alias("id_a"),
        F.col("neighbor_id").cast(_L).alias("id_b"),
        F.col("rank").cast(_L).alias("n"),
        F.col("cosine_sim").cast(_D).alias("v"),
        F.lit(None).cast(_S).alias("members"),
    )
    b = q_embedding_clusters(spark, sf_dir).select(
        F.lit("cluster").alias("stat"),
        F.col("component_id").cast(_L).alias("id_a"),
        F.lit(None).cast(_L).alias("id_b"),
        F.col("n_members").cast(_L).alias("n"),
        F.lit(None).cast(_D).alias("v"),
        F.col("members").cast(_S).alias("members"),
    )
    return a.unionByName(b)


def _sql_embfam_audit() -> str:
    from .registry_text import SQL_ANN_LSH, SQL_EMBEDDING_CLUSTERS

    return f"""
WITH a AS ({SQL_ANN_LSH}),
b AS ({SQL_EMBEDDING_CLUSTERS})
SELECT 'lsh' AS stat, CAST(query_id AS BIGINT) AS id_a,
       CAST(neighbor_id AS BIGINT) AS id_b, CAST(rank AS BIGINT) AS n,
       CAST(cosine_sim AS DOUBLE) AS v, CAST(NULL AS VARCHAR) AS members
FROM a
UNION ALL
SELECT 'cluster', CAST(component_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(n_members AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(members AS VARCHAR)
FROM b
"""


STAGED_QUERIES = {
    "skewjoin_audit": q_skewjoin_audit,
    "saltagg_audit": q_saltagg_audit,
    "sketchall_audit": q_sketchall_audit,
    "embfam_audit": q_embfam_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "skewjoin_audit": SQL_SKEWJOIN_AUDIT,
        "saltagg_audit": SQL_SALTAGG_AUDIT,
        "sketchall_audit": _sql_sketchall_audit(),
        "embfam_audit": _sql_embfam_audit(),
    }


# names each staged consolidation row replaces at registration time
# (all four legs sit in the r14 head — cohort A — and rotate into the
# r19 head): 50 − 4 + 2 + 2 = 50.
STAGED_REPLACES: dict[str, tuple[str, str]] = {
    "sketchall_audit": ("sketchfam_audit", "kmv_audit"),
    "embfam_audit": ("ann_lsh", "embedding_clusters"),
}
