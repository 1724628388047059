"""Round-17 STAGED registry row — pre-staged with evidence at r13
close (the standing recipe; the registry sits AT the 100 ceiling, so
the row registers only with a funding consolidation chosen by the
session that can see the r17 tail).

* ``dq_audit`` puts the declarative data-quality expectations
  framework (``operators/expectations.py`` — the reference's
  validation-flag battery generalized into check / annotate /
  uniqueness / referential reports) under the hard oracle.  Four legs:

  - ``report`` rows: the one-scan violation counts for three
    row-local rules over orders, with genuine violations on BOTH
    sides at every SF (a mid-range price threshold, a status set, a
    priority prefix) — including the NULL-counts-as-violation
    semantics the framework pins;
  - the ``unique`` leg on o_custkey (massively non-unique: every
    duplicated key's rows count);
  - the ``referential`` leg against an analytic mod-3 subset of
    customer (≈ a third of orders violate at every SF);
  - ``ann`` rows: the per-order failed-rule array, comma-joined in
    declaration order — the quarantine annotation itself under the
    value hash.

  Every quantity is an exact integer except ``frac`` =
  round(v/n, 6) — the registered-row rounding convention.  The DuckDB
  twin replays each count with CASE arithmetic, the duplicate-key sum
  with a grouped HAVING, the anti-join with NOT IN over the same
  analytic dim, and the annotation with concat_ws (which skips the
  NULL branches exactly like array_join over array_compact).

* ``cdc_audit`` (appended below) puts ``operators/merge.py::
  apply_cdc`` — ordered change-stream application — under the hard
  oracle; see its own section.

TWO r17 rows staged → two funding consolidations needed, and exactly
two same-family candidate pairs are visible from here (all legs in
the r13 head, which rotates into the r17 head via
r14-tail/r15-head/r16-tail): ``crawlfam_audit`` + ``html_extract``
(web-page family) and ``docmeta_audit`` + ``lexstats_audit``
(doc-metadata unions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PRICE_HI = 150_000.0
_STATUSES = ("O", "F")
_PRIO = "1-%"


def _rules():
    from .operators.expectations import expect

    return [
        expect("price_hi", F.col("o_totalprice") > _PRICE_HI),
        expect("status_known", F.col("o_orderstatus").isin(*_STATUSES)),
        expect("prio_urgent", F.col("o_orderpriority").like(_PRIO)),
    ]


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import expectations as dq
    from .session import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    dim = cust.filter(F.col("c_custkey") % 3 != 0).select("c_custkey")
    report = dq.full_report(
        orders,
        rules=_rules(),
        unique_keys=[["o_custkey"]],
        dims=[("o_custkey", dim, "c_custkey")],
    ).select(
        F.lit("report").alias("leg"),
        F.col("rule").cast("string").alias("k1"),
        F.col("kind").cast("string").alias("k2"),
        F.col("n_violations").cast("long").alias("n1"),
        F.col("n_rows").cast("long").alias("n2"),
        F.col("frac").cast("double").alias("v"),
    )
    ann = dq.annotate(orders, _rules()).select(
        F.lit("ann").alias("leg"),
        F.col("o_orderkey").cast("string").alias("k1"),
        F.array_join("violations", ",").alias("k2"),
        F.lit(None).cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
        F.lit(None).cast("double").alias("v"),
    )
    return report.unionByName(ann)


def _sql_dq_audit() -> str:
    fails = {
        "price_hi": f"NOT coalesce(o_totalprice > {_PRICE_HI!r}, FALSE)",
        "status_known": "NOT coalesce(o_orderstatus IN ('O', 'F'), FALSE)",
        "prio_urgent": f"NOT coalesce(o_orderpriority LIKE '{_PRIO}', FALSE)",
    }
    count_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, 'row' AS kind, "
        f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS v, COUNT(*) AS n "
        "FROM orders"
        for name, cond in fails.items()
    )
    ann_cases = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in fails.items()
    )
    return f"""
WITH counts AS (
  {count_rows}
  UNION ALL
  SELECT 'unique(o_custkey)', 'unique',
         coalesce((SELECT SUM(c) FROM (
            SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey
            HAVING COUNT(*) > 1)), 0),
         COUNT(*)
  FROM orders
  UNION ALL
  SELECT 'in_dim(o_custkey)', 'referential',
         SUM(CASE WHEN o_custkey NOT IN (
            SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0)
            THEN 1 ELSE 0 END),
         COUNT(*)
  FROM orders
)
SELECT 'report' AS leg, CAST(rule AS VARCHAR) AS k1,
       CAST(kind AS VARCHAR) AS k2, CAST(v AS BIGINT) AS n1,
       CAST(n AS BIGINT) AS n2,
       CAST(CASE WHEN n > 0 THEN round(CAST(v AS DOUBLE) / n, 6)
                 ELSE 0.0 END AS DOUBLE) AS v
FROM counts
UNION ALL
SELECT 'ann', CAST(o_orderkey AS VARCHAR),
       concat_ws(',', {ann_cases}),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM orders
"""


SQL_DQ_AUDIT = _sql_dq_audit()

STAGED_QUERIES = {
    "dq_audit": q_dq_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "dq_audit": SQL_DQ_AUDIT,
        "cdc_audit": SQL_CDC_AUDIT,
    }


# funding consolidation chosen at r16/r17 close (module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}


# ---------------------------------------------------------------------------
# cdc_audit — ordered change-stream application (``operators/merge.py::
# apply_cdc``) under the hard oracle.  Target = customers (exact
# integer balance cents); changes = an ANALYTIC CDC view of orders
# (key = o_custkey, seq = o_orderkey — unique, so (key, seq) satisfies
# the strict contract; every 7th order is a delete, the rest upserts
# carrying a synthesized name + the order's total in cents).  The
# final state puts every apply_cdc decision under the value hash:
# untouched target rows survive verbatim, the per-key HIGHEST-seq
# change wins, delete winners remove the key, upsert winners replace
# the payload.  The DuckDB twin replays the winner window
# (ROW_NUMBER over seq DESC), the untouched anti-join, and the upsert
# union — decision for decision; every quantity is an exact integer
# or string.  The strict guard (folded assert) runs live on the Spark
# side with uniqueness guaranteed by construction.


def q_cdc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.merge import apply_cdc
    from .session import read_table

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    target = cust.select(
        "c_custkey",
        F.col("c_name").cast("string").alias("c_name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    # custkeys ≡ 0 (mod 5) receive NO changes, so the untouched-target
    # branch is populated at every SF alongside replace/delete/insert
    changes = orders.filter(F.col("o_custkey") % 5 != 0).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias(
            "c_name"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("bal_c"),
    )
    out = apply_cdc(target, changes, ["c_custkey"])
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_name").cast("string").alias("c_name"),
        F.col("bal_c").cast("long").alias("bal_c"),
    )


SQL_CDC_AUDIT = """
WITH t AS (
  SELECT c_custkey, CAST(c_name AS VARCHAR) AS c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
ch AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op,
         'u' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS bal_c
  FROM orders WHERE o_custkey % 5 <> 0
),
latest AS (
  SELECT * FROM (
    SELECT ch.*, ROW_NUMBER() OVER (
      PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
)
SELECT CAST(t.c_custkey AS BIGINT) AS c_custkey, t.c_name,
       CAST(t.bal_c AS BIGINT) AS bal_c
FROM t
WHERE t.c_custkey NOT IN (SELECT c_custkey FROM latest)
UNION ALL
SELECT CAST(c_custkey AS BIGINT), c_name, CAST(bal_c AS BIGINT)
FROM latest WHERE op = 'upsert'
"""

STAGED_QUERIES["cdc_audit"] = q_cdc_audit
