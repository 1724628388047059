"""Round-12 IN-ROUND registry rows (the registry_r10/r11 precedent):
one consolidation union made WITHIN the rotating-in set funds one new
operator row, keeping the 50-row window arithmetic intact
(head 50 − 2 legs + 1 union + 1 new = 50; registry stays at 100).

* ``weights_audit`` = ``dsir_weights`` + ``temperature_resample``:
  both are data-curation sampling-weight rows (per-doc DSIR importance
  weights; per-source α-temperature keep fractions) — same family.
  Each leg calls the ORIGINAL query function verbatim and the oracle
  wraps the ORIGINAL SQL in a CTE, so both operators stay
  hash-verified and drift is impossible.

* ``kmv_audit`` puts the round-11 KMV bottom-k sketch family
  (``operators/sketches.py::kmv_sketch`` / ``kmv_estimate`` — the one
  r11 family without a hard oracle row, VERDICT r11 Next #4) under
  the driver signal.  Two legs cover BOTH estimator branches: the
  documents table grouped by source (25 distinct texts per group —
  the exact ``n < k`` branch where the sketch IS the distinct hash
  set) and lineitem grouped by return flag (hundreds-to-thousands of
  distinct order keys per group — the unbiased ``(k−1)·2^60 / h_k``
  branch).  Every sketch hash lands under the value hash via
  posexplode (60-bit md5 integers — exact BIGINT on both engines; the
  estimate's float division rounds to 6dp on both sides).  The DuckDB
  twin replays hash → per-group distinct → bottom-k → estimate
  decision-for-decision (``tests/test_sketches.py::
  test_kmv_duckdb_parity`` pins the same arithmetic on an independent
  fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"

_KMV_K = 64


# ---------------------------------------------------------------------------
# weights_audit = dsir_weights + temperature_resample


def q_weights_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_dsir_weights, q_temperature_resample
    from .session import overlap_builds

    # independent legs — overlap their eager builds (guide §2.6)
    a_raw, b_raw = overlap_builds(
        lambda: q_dsir_weights(spark, sf_dir),
        lambda: q_temperature_resample(spark, sf_dir),
    )
    a = a_raw.select(
        F.lit("dsir").alias("stat"),
        F.col("doc_id").cast(_S).alias("k1"),
        F.col("n_tokens").cast(_L).alias("n"),
        F.lit(None).cast(_L).alias("n2"),
        F.col("dsir_weight").cast(_D).alias("v"),
    )
    b = b_raw.select(
        F.lit("resample").alias("stat"),
        F.col("source").cast(_S).alias("k1"),
        F.col("n_docs").cast(_L).alias("n"),
        F.col("n_kept").cast(_L).alias("n2"),
        F.col("frac_kept").cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_weights_audit() -> str:
    from .registry_curation import SQL_DSIR_WEIGHTS, SQL_TEMPERATURE_RESAMPLE

    return f"""
WITH a AS ({SQL_DSIR_WEIGHTS}),
b AS ({SQL_TEMPERATURE_RESAMPLE})
SELECT 'dsir' AS stat, CAST(doc_id AS VARCHAR) AS k1,
       CAST(n_tokens AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n2,
       CAST(dsir_weight AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'resample', CAST(source AS VARCHAR), CAST(n_docs AS BIGINT),
       CAST(n_kept AS BIGINT), CAST(frac_kept AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# kmv_audit — bottom-k distinct sketches under the hard oracle.


def q_kmv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import kmv_estimate, kmv_sketch
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("source").alias("grp"), F.col("text").alias("v")
    )
    line = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_orderkey").cast(_S).alias("v"),
    )
    # ONE sketch job over the union of both tables, keyed (tbl, grp)
    # (r14, guide §2.4/§2.6): the former per-table loop ran the full
    # distinct + bottom-k pipeline once per (table × leg) — four
    # computations, then (after the materialization fix) two SERIAL
    # checkpoint jobs, each too small to fill the cluster.  The md5
    # hash depends only on the value, so per-(tbl, grp) bottom-k over
    # the union is bit-identical to per-table bottom-k per grp; one
    # checkpoint materializes every sketch row (k-bounded per group),
    # and both output legs project from it.
    vals = docs.select(F.lit("docs").alias("tbl"), "grp", "v").unionByName(
        line.select(F.lit("line").alias("tbl"), "grp", "v")
    )
    sk = kmv_sketch(
        vals, "v", group_cols=["tbl", "grp"], k=_KMV_K
    ).localCheckpoint()
    h = (
        sk.select("tbl", F.col("grp").cast(_S).alias("grp"), F.posexplode("kmv"))
        .select(
            "tbl",
            F.lit("kmv").alias("stat"),
            "grp",
            (F.col("pos") + 1).cast(_L).alias("pos"),
            F.col("col").cast(_L).alias("hv"),
            F.lit(None).cast(_D).alias("est"),
        )
    )
    e = kmv_estimate(sk).select(
        "tbl",
        F.lit("est").alias("stat"),
        F.col("grp").cast(_S).alias("grp"),
        F.lit(None).cast(_L).alias("pos"),
        F.lit(None).cast(_L).alias("hv"),
        F.col("kmv_distinct").cast(_D).alias("est"),
    )
    return h.unionByName(e)


SQL_KMV_AUDIT = f"""
WITH vals AS (
  SELECT 'docs' AS tbl, source AS grp, CAST(text AS VARCHAR) AS v
  FROM documents
  UNION ALL
  SELECT 'line', l_returnflag, CAST(l_orderkey AS VARCHAR)
  FROM lineitem
),
h AS (
  SELECT DISTINCT tbl, grp,
         ('0x' || substr(md5('kmv_' || v), 1, 15))::BIGINT AS hh
  FROM vals
),
rk AS (
  SELECT tbl, grp, hh,
         ROW_NUMBER() OVER (PARTITION BY tbl, grp ORDER BY hh) AS rn
  FROM h
),
bot AS (SELECT * FROM rk WHERE rn <= {_KMV_K}),
est AS (
  SELECT tbl, grp, COUNT(*) AS n, MAX(hh) AS hk
  FROM bot GROUP BY tbl, grp
)
SELECT tbl, 'kmv' AS stat, CAST(grp AS VARCHAR) AS grp,
       CAST(rn AS BIGINT) AS pos, CAST(hh AS BIGINT) AS hv,
       CAST(NULL AS DOUBLE) AS est
FROM bot
UNION ALL
SELECT tbl, 'est', CAST(grp AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT),
       round(CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 * 1152921504606846976.0 / hk END, 6)
FROM est
"""


SPARK_QUERIES = {
    "weights_audit": q_weights_audit,
    "kmv_audit": q_kmv_audit,
}


def build_oracle_sql() -> dict[str, str]:
    return {
        "weights_audit": _sql_weights_audit(),
        "kmv_audit": SQL_KMV_AUDIT,
    }


# names the in-round consolidation replaces at registration time
AUDIT_REPLACES = {
    "weights_audit": ("dsir_weights", "temperature_resample"),
}
