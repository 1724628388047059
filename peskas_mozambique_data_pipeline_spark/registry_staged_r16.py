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


# ---------------------------------------------------------------------------
# kcore_audit — the iterative k-core peel (``operators/graph.py::
# kcore``) under the hard oracle, the graph family's second iterative
# row (dedup_clusters' recursive reachability being the first).
#
# Graph: a DETERMINISTIC synthesis over the contiguous doc_id range
# (0..m−1 at every SF) whose peel depth is bounded BY CONSTRUCTION,
# independent of corpus size:
#   * ring  (i, (i+1) mod m)                — every node degree ≥ 2;
#   * chords (i, (i+7) mod m) for i%3 == 0  — degree spice;
#   * pendant 3-paths i—p1—p2—p3 (pj = i + j·10^6) for i%11 == 0 —
#     the peel driver: for k=2 they strip one hop per round (depth
#     exactly 3 + the empty probe round), at ANY scale factor.
# Legs: k=2 (core = ring + chords; pendants peel away) and k=5 (every
# node peels in round one — the empty-core branch).  The Spark side
# runs with ``max_iter=6``, so convergence within the oracle's SIX
# unrolled peel levels is enforced by a raise, not assumed; the
# DuckDB twin replays edge canonicalization (least/greatest +
# DISTINCT), per-level degree counts and survivor semi-filters level
# by level (the ivf_audit bounded-unroll precedent).  Every quantity
# is an exact integer — no float boundary anywhere.

_KCORE_LEVELS = 6


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("i")
    )
    m = docs.agg(F.count(F.lit(1)).alias("m"))
    base = docs.crossJoin(F.broadcast(m))
    ring = base.select("i", ((F.col("i") + 1) % F.col("m")).alias("j"))
    chords = base.filter(F.col("i") % 3 == 0).select(
        "i", ((F.col("i") + 7) % F.col("m")).alias("j")
    )
    pend = docs.filter(F.col("i") % 11 == 0)
    p = [
        pend.select("i", (F.col("i") + 1_000_000).alias("j")),
        pend.select(
            (F.col("i") + 1_000_000).alias("i"),
            (F.col("i") + 2_000_000).alias("j"),
        ),
        pend.select(
            (F.col("i") + 2_000_000).alias("i"),
            (F.col("i") + 3_000_000).alias("j"),
        ),
    ]
    out = ring.unionByName(chords)
    for leg in p:
        out = out.unionByName(leg)
    return out


def q_kcore_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import kcore

    edges = _kcore_edges(spark, sf_dir)
    parts = []
    for k in (2, 5):
        core = kcore(edges, k, a_col="i", b_col="j",
                     max_iter=_KCORE_LEVELS)
        parts.append(
            core.select(
                F.lit(f"k{k}").alias("stat"),
                F.col("n").cast("long").alias("n"),
                F.col("degree").cast("long").alias("degree"),
            )
        )
    return parts[0].unionByName(parts[1])


def _kcore_sql() -> str:
    edges = """
WITH docs AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents),
mm AS (SELECT COUNT(*) AS m FROM docs),
raw AS (
  SELECT i, (i + 1) % m AS j FROM docs, mm
  UNION ALL
  SELECT i, (i + 7) % m FROM docs, mm WHERE i % 3 = 0
  UNION ALL
  SELECT i, i + 1000000 FROM docs WHERE i % 11 = 0
  UNION ALL
  SELECT i + 1000000, i + 2000000 FROM docs WHERE i % 11 = 0
  UNION ALL
  SELECT i + 2000000, i + 3000000 FROM docs WHERE i % 11 = 0
),
e_base AS MATERIALIZED (
  SELECT DISTINCT least(i, j) AS a, greatest(i, j) AS b
  FROM raw WHERE i <> j
)"""
    legs = []
    for k in (2, 5):
        lvl = [f"e_{k}_0 AS MATERIALIZED (SELECT a, b FROM e_base)"]
        for lv in range(_KCORE_LEVELS):
            lvl.append(
                f"""d_{k}_{lv} AS MATERIALIZED (
  SELECT n, COUNT(*) AS deg FROM (
    SELECT a AS n FROM e_{k}_{lv} UNION ALL SELECT b FROM e_{k}_{lv}
  ) GROUP BY n
),
e_{k}_{lv + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e_{k}_{lv} e
  JOIN d_{k}_{lv} x ON e.a = x.n AND x.deg >= {k}
  JOIN d_{k}_{lv} y ON e.b = y.n AND y.deg >= {k}
)"""
            )
        lvl.append(
            f"""d_{k}_fin AS MATERIALIZED (
  SELECT n, COUNT(*) AS deg FROM (
    SELECT a AS n FROM e_{k}_{_KCORE_LEVELS}
    UNION ALL SELECT b FROM e_{k}_{_KCORE_LEVELS}
  ) GROUP BY n
)"""
        )
        legs.append(",\n".join(lvl))
    return (
        edges
        + ",\n"
        + ",\n".join(legs)
        + f"""
SELECT 'k2' AS stat, CAST(n AS BIGINT) AS n, CAST(deg AS BIGINT) AS degree
FROM d_2_fin
UNION ALL
SELECT 'k5', CAST(n AS BIGINT), CAST(deg AS BIGINT)
FROM d_5_fin
"""
    )


SQL_KCORE_AUDIT = _kcore_sql()


STAGED_QUERIES = {
    "hdr_audit": q_hdr_audit,
    "kcore_audit": q_kcore_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "hdr_audit": SQL_HDR_AUDIT,
        "kcore_audit": SQL_KCORE_AUDIT,
        "graphfam_audit": _sql_graphfam_audit(),
        "mergefam_audit": _sql_mergefam_audit(),
    }


# funding consolidations chosen at r15/r16 close (see module
# docstring).  TWO r16 rows now staged → two consolidations needed
# from the r16 rotating-in set (= the r14 head); same-family pairs
# known to rest there: pagerank + triangle_count (pure graph),
# merge_upsert + conditional_merge / scd2_versions (merge family).
STAGED_REPLACES: dict[str, tuple[str, str]] = {}


# ---------------------------------------------------------------------------
# The TWO r16 funding consolidations, chosen and staged at r13 close
# (the r14/r15 precedent: stage the funding the moment the rotating-in
# set is knowable).  All four legs sit in the r13 TAIL — they rotate
# into the r14 head, rest as the r15 tail, and rotate into the r16
# head, so each union is made WITHIN r16's rotating-in set.  Legs
# verbatim, oracles CTE-wrapped; drift impossible.  Arithmetic: r16
# head = 50 tail − 4 legs + 2 unions + 2 funded (hdr_audit,
# kcore_audit) = 50; registry stays 100.
#
# * ``graphfam_audit`` = ``pagerank`` + ``triangle_count``: the two
#   pure-graph rows (damped power iteration; exact per-part triangle
#   counts) — kcore_audit joins the same family, so funding it from
#   within keeps the whole graph surface on the hard signal.
# * ``mergefam_audit`` = ``merge_upsert`` + ``conditional_merge``: the
#   merge family (anti-join upsert split; conditional 1:1 coalesce).


def q_graphfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_pagerank, q_triangle_count

    a = q_pagerank(spark, sf_dir).select(
        F.lit("pagerank").alias("stat"),
        F.col("node").cast("string").alias("k1"),
        F.lit(None).cast(_L).alias("n"),
        F.col("rank").cast(_D).alias("v"),
    )
    b = q_triangle_count(spark, sf_dir).select(
        F.lit("triangles").alias("stat"),
        F.col("part").cast("string").alias("k1"),
        F.col("triangles").cast(_L).alias("n"),
        F.lit(None).cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_graphfam_audit() -> str:
    from .registry_misc import SQL_PAGERANK, SQL_TRIANGLE_COUNT

    return f"""
WITH a AS ({SQL_PAGERANK}),
b AS ({SQL_TRIANGLE_COUNT})
SELECT 'pagerank' AS stat, CAST(node AS VARCHAR) AS k1,
       CAST(NULL AS BIGINT) AS n, CAST(rank AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'triangles', CAST(part AS VARCHAR), CAST(triangles AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM b
"""


def q_mergefam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_merge_upsert
    from .registry_relational import q_conditional_merge

    a = q_merge_upsert(spark, sf_dir).select(
        F.lit("upsert").alias("stat"),
        F.col("c_custkey").cast(_L).alias("id"),
        F.col("c_name").cast("string").alias("k1"),
        F.col("bal_c").cast(_L).alias("n1"),
        F.col("is_updated").cast(_L).alias("n2"),
        F.lit(None).cast(_D).alias("v1"),
        F.lit(None).cast(_D).alias("v2"),
    )
    b = q_conditional_merge(spark, sf_dir).select(
        F.lit("conditional").alias("stat"),
        F.col("user_id").cast(_L).alias("id"),
        F.col("event_date").cast("string").alias("k1"),
        F.col("click_id").cast(_L).alias("n1"),
        F.col("view_id").cast(_L).alias("n2"),
        F.col("click_value").cast(_D).alias("v1"),
        F.col("view_value").cast(_D).alias("v2"),
    )
    return a.unionByName(b)


def _sql_mergefam_audit() -> str:
    from .registry_misc import SQL_MERGE_UPSERT
    from .registry_relational import SQL_CONDITIONAL_MERGE

    return f"""
WITH a AS ({SQL_MERGE_UPSERT}),
b AS ({SQL_CONDITIONAL_MERGE})
SELECT 'upsert' AS stat, CAST(c_custkey AS BIGINT) AS id,
       CAST(c_name AS VARCHAR) AS k1, CAST(bal_c AS BIGINT) AS n1,
       CAST(is_updated AS BIGINT) AS n2, CAST(NULL AS DOUBLE) AS v1,
       CAST(NULL AS DOUBLE) AS v2
FROM a
UNION ALL
SELECT 'conditional', CAST(user_id AS BIGINT),
       CAST(event_date AS VARCHAR), CAST(click_id AS BIGINT),
       CAST(view_id AS BIGINT), CAST(click_value AS DOUBLE),
       CAST(view_value AS DOUBLE)
FROM b
"""


STAGED_QUERIES["graphfam_audit"] = q_graphfam_audit
STAGED_QUERIES["mergefam_audit"] = q_mergefam_audit

STAGED_REPLACES["graphfam_audit"] = ("pagerank", "triangle_count")
STAGED_REPLACES["mergefam_audit"] = ("merge_upsert", "conditional_merge")
