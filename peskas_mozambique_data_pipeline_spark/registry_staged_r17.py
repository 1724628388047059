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

TWO r17 rows staged → two funding consolidations needed — and both
are now STAGED below with evidence (VERDICT r13 Next #2):
``webfam_audit`` = ``crawlfam_audit`` + ``html_extract`` (web-page
family) and ``docfam_audit`` = ``docmeta_audit`` + ``lexstats_audit``
(doc-metadata family); legs verbatim, CTE-wrapped SQL, two-SF
bit-exact pytest + two-config matrix evidence
(tests/test_registry_staged_r17.py).  All four legs sit in the r13
head, which rotates into the r17 head via r14-tail/r15-head/r16-tail.
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
        "webfam_audit": _sql_webfam_audit(),
        "docfam_audit": _sql_docfam_audit(),
    }


# funding consolidations (filled by the r17 staging section below)
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


# ---------------------------------------------------------------------------
# r17 FUNDING CONSOLIDATIONS (VERDICT r13 Next #2) — the two
# same-family pairs the module docstring records, now staged WITH
# evidence (tests/test_registry_staged_r17.py) instead of being left
# as candidates in NOTES.  All four legs sit in the r13 head, which
# rotates into the r17 head via the r14-tail/r15-head/r16-tail path,
# so both unions are made WITHIN r17's rotating-in set.  Arithmetic:
# r17 head = 50 − 4 legs + 2 unions + 2 funded (dq_audit, cdc_audit)
# = 50; the registry stays AT the 100 ceiling.
#
# * ``webfam_audit`` = ``crawlfam_audit`` + ``html_extract``: the
#   web-page family — the crawl-family union (itself fetch_audit +
#   crawl_audit, legs verbatim inside) and the HTML text-extraction
#   round trip.  Each leg calls the ORIGINAL query function verbatim
#   and the oracle wraps the ORIGINAL SQL in a CTE, so every covered
#   operator stays hash-verified and drift is impossible.
# * ``docfam_audit`` = ``docmeta_audit`` + ``lexstats_audit``: the
#   doc-metadata family — the profile ⋈ signature join row and the
#   term-stats/bigram-logloss union, stat-tagged onto one shared
#   schema with every leg value carried.

_S17 = "string"
_L17 = "long"
_D17 = "double"


def q_webfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_r13 import q_crawlfam_audit
    from .registry_staged_r11 import q_html_extract

    a = q_crawlfam_audit(spark, sf_dir)  # (stat, k1, k2, k3, n, p)
    b = q_html_extract(spark, sf_dir).select(
        F.lit("html").alias("stat"),
        F.col("doc_id").cast(_S17).alias("k1"),
        F.col("title").cast(_S17).alias("k2"),
        F.col("text_clean").cast(_S17).alias("k3"),
        F.col("n_chars_clean").cast(_L17).alias("n"),
        F.lit(None).cast(_D17).alias("p"),
    )
    return a.unionByName(b)


def _sql_webfam_audit() -> str:
    from .registry_r13 import _sql_crawlfam_audit
    from .registry_staged_r11 import SQL_HTML_EXTRACT

    return f"""
WITH a AS ({_sql_crawlfam_audit()}),
b AS ({SQL_HTML_EXTRACT})
SELECT stat, k1, k2, k3, CAST(n AS BIGINT) AS n, CAST(p AS DOUBLE) AS p
FROM a
UNION ALL
SELECT 'html', CAST(doc_id AS VARCHAR), CAST(title AS VARCHAR),
       CAST(text_clean AS VARCHAR), CAST(n_chars_clean AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM b
"""


def q_docfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_staged_r11 import q_lexstats_audit
    from .registry_staged_r13 import q_docmeta_audit

    a = q_docmeta_audit(spark, sf_dir).select(
        F.lit("docmeta").alias("stat"),
        F.col("doc_id").cast(_S17).alias("k1"),
        F.lit(None).cast(_S17).alias("k2"),
        F.col("n_tokens").cast(_L17).alias("n1"),
        F.col("mean_token_len").cast(_D17).alias("v1"),
        F.col("punct_ratio").cast(_D17).alias("v2"),
        F.col("stopword_ratio").cast(_D17).alias("v3"),
        F.col("quality_score").cast(_D17).alias("v4"),
        F.col("lang").cast(_S17).alias("s1"),
        F.col("pred_lang").cast(_S17).alias("s2"),
        F.col("score_de").cast(_L17).alias("n2"),
        F.col("score_en").cast(_L17).alias("n3"),
        F.col("score_es").cast(_L17).alias("n4"),
        F.col("score_fr").cast(_L17).alias("n5"),
        F.col("fingerprint").cast(_S17).alias("fp1"),
        F.col("winnow_fp").cast(_S17).alias("fp2"),
    )
    b = q_lexstats_audit(spark, sf_dir).select(
        F.col("stat").cast(_S17).alias("stat"),
        F.col("key1").cast(_S17).alias("k1"),
        F.col("key2").cast(_S17).alias("k2"),
        F.col("cnt").cast(_L17).alias("n1"),
        F.col("score").cast(_D17).alias("v1"),
        *[F.lit(None).cast(_D17).alias(c) for c in ("v2", "v3", "v4")],
        *[F.lit(None).cast(_S17).alias(c) for c in ("s1", "s2")],
        *[F.lit(None).cast(_L17).alias(c) for c in ("n2", "n3", "n4", "n5")],
        *[F.lit(None).cast(_S17).alias(c) for c in ("fp1", "fp2")],
    )
    return a.unionByName(b)


def _sql_docfam_audit() -> str:
    from .registry_staged_r11 import _sql_lexstats_audit
    from .registry_staged_r13 import _sql_docmeta_audit

    return f"""
WITH a AS ({_sql_docmeta_audit()}),
b AS ({_sql_lexstats_audit()})
SELECT 'docmeta' AS stat, CAST(doc_id AS VARCHAR) AS k1,
       CAST(NULL AS VARCHAR) AS k2, CAST(n_tokens AS BIGINT) AS n1,
       CAST(mean_token_len AS DOUBLE) AS v1,
       CAST(punct_ratio AS DOUBLE) AS v2,
       CAST(stopword_ratio AS DOUBLE) AS v3,
       CAST(quality_score AS DOUBLE) AS v4,
       CAST(lang AS VARCHAR) AS s1, CAST(pred_lang AS VARCHAR) AS s2,
       CAST(score_de AS BIGINT) AS n2, CAST(score_en AS BIGINT) AS n3,
       CAST(score_es AS BIGINT) AS n4, CAST(score_fr AS BIGINT) AS n5,
       CAST(fingerprint AS VARCHAR) AS fp1,
       CAST(winnow_fp AS VARCHAR) AS fp2
FROM a
UNION ALL
SELECT stat, CAST(key1 AS VARCHAR), CAST(key2 AS VARCHAR),
       CAST(cnt AS BIGINT), CAST(score AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM b
"""


STAGED_QUERIES["webfam_audit"] = q_webfam_audit
STAGED_QUERIES["docfam_audit"] = q_docfam_audit

STAGED_REPLACES.update(
    {
        "webfam_audit": ("crawlfam_audit", "html_extract"),
        "docfam_audit": ("docmeta_audit", "lexstats_audit"),
    }
)
