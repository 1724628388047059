"""Round-18 STAGED registry rows — pre-staged four rounds out with
full evidence (the r13-close discipline; the registry sits AT the 100
ceiling, so rows register only with funding consolidations made
WITHIN the r18 rotating-in set).

* ``privacy_audit`` puts the re-identification-risk surface
  (``operators/privacy.py`` — k-anonymity, l-diversity, rare-group
  suppression) under the hard oracle.  The quasi-identifier is
  ANALYTIC so both predicate sides are populated at every SF:
  customers with ``c_custkey % 97 == 0`` get a UNIQUE qi (guaranteed
  singleton classes → k-anonymity violations), everyone else lands in
  one of seven ``common_<custkey%7>`` classes (hundreds of members →
  safe).  Three legs share one generic schema: the one-row k-anonymity
  report (k=3), the per-class l-diversity report over
  ``c_mktsegment`` (l=3; singletons are never diverse, commons carry
  all five segments), and the grouped survivors of
  ``suppress_rare_groups`` (count + exact custkey sum per kept class
  — the suppression decision itself under the value hash).  The
  DuckDB twin replays class sizes, the CASE-sum report, COUNT
  DISTINCT diversity, and the size-gated semi-join in plain SQL.

* ``ivm_audit`` puts the incremental-view-maintenance delta math
  (``streaming/rollup_zone._contribution_delta`` over
  ``cdc_zone._winners`` — the retract/apply fold the rollup zone
  ships per micro-batch) under the hard oracle.  State = customers
  keyed by custkey, grouped by ``c_mktsegment``, measured in exact
  acctbal cents; the change batch = the cdc_audit analytic view of
  orders (key ``o_custkey``, seq ``o_orderkey``, delete on mod-7)
  but grouped by ``o_orderpriority`` — every winner MOVES its key
  across group domains, so the delta carries genuine retractions
  (negative counts/sums in the mktsegment groups) AND applications
  (positive in the priority groups) at every SF.  The twin replays
  the winner window, the touched-key semi-join, and the ±1-weighted
  group fold decision for decision; every quantity is an exact
  integer.

FOUR r18 registrations → two funding consolidations, both staged
HERE with evidence (legs sit in the r14 head = the r18 rotating-in
set via r15-tail/r16-head/r17-tail):

* ``dedupall_audit`` = ``bandpairs_audit`` + ``dedupfam_audit`` (the
  whole dedup family: banded near-dup pair generators + exact-digest
  groups + connected-component clusters — the two r14 funding unions
  themselves merge, the crawlfam-inside-webfam precedent);
* ``tsfam_audit`` = ``trailing_window`` + ``time_weighted_avg`` (the
  time-series window family).

Arithmetic: r18 head = 50 − 4 legs + 2 unions + 2 funded = 50; the
registry stays AT the 100 ceiling.  Every row below carries bit-exact
sf0.001 + sf0.01 pytest evidence (tests/test_registry_staged_r18.py)
plus the sf0.1 local[8] / sf0.01 local[3] determinism matrix recorded
at r14 close (NOTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"

_K_ANON = 3
_L_DIV = 3


def _qi_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import read_table

    cust = read_table(spark, sf_dir, "customer")
    qi = F.when(
        F.col("c_custkey") % 97 == 0,
        F.concat(F.lit("rare_"), F.col("c_custkey").cast(_S)),
    ).otherwise(
        F.concat(F.lit("common_"), (F.col("c_custkey") % 7).cast(_S))
    )
    return cust.select(
        qi.alias("qi"),
        F.col("c_mktsegment").alias("sens"),
        F.col("c_custkey").alias("k"),
    )


def q_privacy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import privacy as pv

    t = _qi_frame(spark, sf_dir).localCheckpoint()
    nulls = [F.lit(None).cast(_L).alias(c) for c in ("n5", "n6")]
    kanon = pv.k_anonymity_report(t, ["qi"], _K_ANON).select(
        F.lit("kanon").alias("leg"),
        F.lit(None).cast(_S).alias("k1"),
        F.col("k_threshold").cast(_L).alias("n1"),
        F.col("n_rows").cast(_L).alias("n2"),
        F.col("n_classes").cast(_L).alias("n3"),
        F.col("min_class_size").cast(_L).alias("n4"),
        F.col("n_risky_classes").cast(_L).alias("n5"),
        F.col("n_risky_rows").cast(_L).alias("n6"),
    )
    ldiv = pv.l_diversity_report(t, ["qi"], "sens", _L_DIV).select(
        F.lit("ldiv").alias("leg"),
        F.col("qi").cast(_S).alias("k1"),
        F.col("class_size").cast(_L).alias("n1"),
        F.col("diversity").cast(_L).alias("n2"),
        F.col("diverse").cast(_L).alias("n3"),
        F.lit(None).cast(_L).alias("n4"),
        *nulls,
    )
    sup = (
        pv.suppress_rare_groups(t, ["qi"], _K_ANON)
        .groupBy("qi")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("k").alias("sum_key"),
        )
        .select(
            F.lit("sup").alias("leg"),
            F.col("qi").cast(_S).alias("k1"),
            F.col("n_kept").cast(_L).alias("n1"),
            F.col("sum_key").cast(_L).alias("n2"),
            F.lit(None).cast(_L).alias("n3"),
            F.lit(None).cast(_L).alias("n4"),
            *nulls,
        )
    )
    return kanon.unionByName(ldiv).unionByName(sup)


SQL_PRIVACY_AUDIT = f"""
WITH t AS (
  SELECT CASE WHEN c_custkey % 97 = 0
              THEN 'rare_' || CAST(c_custkey AS VARCHAR)
              ELSE 'common_' || CAST(c_custkey % 7 AS VARCHAR) END AS qi,
         c_mktsegment AS sens, c_custkey AS k
  FROM customer
),
cs AS (SELECT qi, COUNT(*) AS class_size FROM t GROUP BY qi),
kanon AS (
  SELECT {_K_ANON} AS k_threshold, SUM(class_size) AS n_rows,
         COUNT(*) AS n_classes, MIN(class_size) AS min_class_size,
         SUM(CASE WHEN class_size < {_K_ANON} THEN 1 ELSE 0 END)
           AS n_risky_classes,
         SUM(CASE WHEN class_size < {_K_ANON} THEN class_size ELSE 0 END)
           AS n_risky_rows
  FROM cs
),
ldiv AS (
  SELECT qi, COUNT(*) AS class_size, COUNT(DISTINCT sens) AS diversity
  FROM t GROUP BY qi
),
sup AS (
  SELECT t.qi, COUNT(*) AS n_kept, SUM(t.k) AS sum_key
  FROM t JOIN cs ON t.qi = cs.qi
  WHERE cs.class_size >= {_K_ANON}
  GROUP BY t.qi
)
SELECT 'kanon' AS leg, CAST(NULL AS VARCHAR) AS k1,
       CAST(k_threshold AS BIGINT) AS n1, CAST(n_rows AS BIGINT) AS n2,
       CAST(n_classes AS BIGINT) AS n3,
       CAST(min_class_size AS BIGINT) AS n4,
       CAST(n_risky_classes AS BIGINT) AS n5,
       CAST(n_risky_rows AS BIGINT) AS n6
FROM kanon
UNION ALL
SELECT 'ldiv', qi, CAST(class_size AS BIGINT), CAST(diversity AS BIGINT),
       CAST(CASE WHEN diversity >= {_L_DIV} THEN 1 ELSE 0 END AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM ldiv
UNION ALL
SELECT 'sup', qi, CAST(n_kept AS BIGINT), CAST(sum_key AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM sup
"""


def q_ivm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import read_table
    from .streaming.cdc_zone import _winners
    from .streaming.rollup_zone import _contribution_delta

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    state = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("grp"),
        F.round(F.col("c_acctbal") * 100).cast(_L).alias("cents"),
    )
    ch = orders.filter(F.col("o_custkey") % 5 != 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast(_L).alias("cents"),
    )
    win = _winners(ch, ["k"], "seq", "op", "upsert", "delete", strict=True)
    new = win.filter(F.col("op") == "upsert").select("grp", "cents")
    old = state.join(win.select("k"), "k", "left_semi").select(
        "grp", "cents"
    )
    delta = _contribution_delta(old, new, ["grp"], ["cents"])
    return delta.select(
        F.col("grp").cast(_S).alias("grp"),
        F.col("n_rows").cast(_L).alias("n_rows"),
        F.col("sum_cents").cast(_L).alias("sum_cents"),
    )


SQL_IVM_AUDIT = """
WITH state AS (
  SELECT c_custkey AS k, c_mktsegment AS grp,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
ch AS (
  SELECT o_custkey AS k, o_orderkey AS seq,
         CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op,
         o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_custkey % 5 <> 0
),
win AS (
  SELECT * FROM (
    SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
),
contrib AS (
  SELECT s.grp, -1 AS w, -s.cents AS cents
  FROM state s WHERE s.k IN (SELECT k FROM win)
  UNION ALL
  SELECT grp, 1, cents FROM win WHERE op = 'upsert'
)
SELECT CAST(grp AS VARCHAR) AS grp, CAST(SUM(w) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM contrib GROUP BY grp
"""


# ---------------------------------------------------------------------------
# funding consolidations (legs verbatim, CTE-wrapped SQL)


def q_dedupall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_staged_r14 import q_bandpairs_audit, q_dedupfam_audit

    a = q_bandpairs_audit(spark, sf_dir).select(
        "stat",
        F.lit(None).cast(_S).alias("k1"),
        F.col("id_a").cast(_L).alias("id_a"),
        F.col("id_b").cast(_L).alias("id_b"),
        F.col("n").cast(_L).alias("n"),
        F.col("v").cast(_D).alias("v"),
        F.lit(None).cast(_S).alias("members"),
    )
    b = q_dedupfam_audit(spark, sf_dir).select(
        "stat",
        F.col("k1").cast(_S).alias("k1"),
        F.lit(None).cast(_L).alias("id_a"),
        F.lit(None).cast(_L).alias("id_b"),
        F.col("n").cast(_L).alias("n"),
        F.lit(None).cast(_D).alias("v"),
        F.col("members").cast(_S).alias("members"),
    )
    return a.unionByName(b)


def _sql_dedupall_audit() -> str:
    from .registry_staged_r14 import _sql_bandpairs_audit, _sql_dedupfam_audit

    return f"""
WITH a AS ({_sql_bandpairs_audit()}),
b AS ({_sql_dedupfam_audit()})
SELECT stat, CAST(NULL AS VARCHAR) AS k1, CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b, CAST(n AS BIGINT) AS n,
       CAST(v AS DOUBLE) AS v, CAST(NULL AS VARCHAR) AS members
FROM a
UNION ALL
SELECT stat, CAST(k1 AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(n AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(members AS VARCHAR)
FROM b
"""


def q_tsfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_time_weighted_avg, q_trailing_window

    a = q_trailing_window(spark, sf_dir).select(
        F.lit("trail").alias("stat"),
        F.col("n_name").cast(_S).alias("k1"),
        F.col("day_idx").cast(_L).alias("id"),
        F.col("days_in_window").cast(_L).alias("n1"),
        F.lit(None).cast(_L).alias("n2"),
        F.col("day_revenue").cast(_D).alias("v1"),
        F.col("trailing_28d_revenue").cast(_D).alias("v2"),
    )
    b = q_time_weighted_avg(spark, sf_dir).select(
        F.lit("twa").alias("stat"),
        F.lit(None).cast(_S).alias("k1"),
        F.col("user_id").cast(_L).alias("id"),
        F.col("n_obs").cast(_L).alias("n1"),
        F.col("total_dur_s").cast(_L).alias("n2"),
        F.col("tw_mean").cast(_D).alias("v1"),
        F.lit(None).cast(_D).alias("v2"),
    )
    return a.unionByName(b)


def _sql_tsfam_audit() -> str:
    from .registry_misc import SQL_TIME_WEIGHTED_AVG, SQL_TRAILING_WINDOW

    return f"""
WITH a AS ({SQL_TRAILING_WINDOW}),
b AS ({SQL_TIME_WEIGHTED_AVG})
SELECT 'trail' AS stat, CAST(n_name AS VARCHAR) AS k1,
       CAST(day_idx AS BIGINT) AS id,
       CAST(days_in_window AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
       CAST(day_revenue AS DOUBLE) AS v1,
       CAST(trailing_28d_revenue AS DOUBLE) AS v2
FROM a
UNION ALL
SELECT 'twa', CAST(NULL AS VARCHAR), CAST(user_id AS BIGINT),
       CAST(n_obs AS BIGINT), CAST(total_dur_s AS BIGINT),
       CAST(tw_mean AS DOUBLE), CAST(NULL AS DOUBLE)
FROM b
"""


STAGED_QUERIES = {
    "privacy_audit": q_privacy_audit,
    "ivm_audit": q_ivm_audit,
    "dedupall_audit": q_dedupall_audit,
    "tsfam_audit": q_tsfam_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "privacy_audit": SQL_PRIVACY_AUDIT,
        "ivm_audit": SQL_IVM_AUDIT,
        "dedupall_audit": _sql_dedupall_audit(),
        "tsfam_audit": _sql_tsfam_audit(),
    }


# names each staged consolidation row replaces at registration time
# (all four legs sit in the r14 head and rotate into the r18 head):
# 50 − 4 + 2 + 2 = 50.
STAGED_REPLACES: dict[str, tuple[str, str]] = {
    "dedupall_audit": ("bandpairs_audit", "dedupfam_audit"),
    "tsfam_audit": ("trailing_window", "time_weighted_avg"),
}
