"""Round-13 IN-ROUND registry rows (the registry_r10/r11/r12
precedent): two consolidation unions made WITHIN the rotating-in set
fund the two remaining staged r13 operator rows (``nearest_audit``,
``release_fold`` — VERDICT r12 Next #2), keeping the 50-row window
arithmetic intact (head = 50 tail − 10 legs + 5 unions + 5 new = 50;
registry stays at the 100 ceiling).

* ``crawlfam_audit`` = ``fetch_audit`` + ``crawl_audit``: the two
  crawl-family rows (politeness-scheduled fetch offsets; anchor +
  sitemap extraction) — the same-family pairing NOTES recorded at r12
  close ("fetch_audit + crawl_audit in the crawl family").  Each leg
  calls the ORIGINAL query function verbatim and the oracle wraps the
  ORIGINAL SQL in a CTE, so both operators stay hash-verified and
  drift is impossible.

* ``geofam_audit`` = ``geo_assign`` + ``geo_rollup_join``: the two
  spatial rows (ray-cast region assignment incl. holes/MultiPolygon;
  the GeoJSON attribute-join rollup) — one geo family, stat-tagged
  union, legs verbatim.  Funding the haversine/argmin ``nearest_audit``
  row from within the geo family keeps the whole spatial surface on
  the hard driver signal every rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"


# ---------------------------------------------------------------------------
# crawlfam_audit = fetch_audit + crawl_audit


def q_crawlfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_staged_r11 import q_crawl_audit, q_fetch_audit
    from .session import overlap_builds

    # independent legs — overlap their eager builds (guide §2.6)
    a_raw, b_raw = overlap_builds(
        lambda: q_fetch_audit(spark, sf_dir),
        lambda: q_crawl_audit(spark, sf_dir),
    )
    a = a_raw.select(
        F.lit("fetch").alias("stat"),
        F.col("doc_id").cast(_S).alias("k1"),
        F.col("url").cast(_S).alias("k2"),
        F.lit(None).cast(_S).alias("k3"),
        F.col("fetch_offset_ms").cast(_L).alias("n"),
        F.lit(None).cast(_D).alias("p"),
    )
    b = b_raw.select(
        F.col("stat").cast(_S).alias("stat"),
        F.col("k1").cast(_S).alias("k1"),
        F.col("k2").cast(_S).alias("k2"),
        F.col("k3").cast(_S).alias("k3"),
        F.lit(None).cast(_L).alias("n"),
        F.col("p").cast(_D).alias("p"),
    )
    return a.unionByName(b)


def _sql_crawlfam_audit() -> str:
    from .registry_staged_r11 import SQL_CRAWL_AUDIT, SQL_FETCH_AUDIT

    return f"""
WITH a AS ({SQL_FETCH_AUDIT}),
b AS ({SQL_CRAWL_AUDIT})
SELECT 'fetch' AS stat, CAST(doc_id AS VARCHAR) AS k1,
       CAST(url AS VARCHAR) AS k2, CAST(NULL AS VARCHAR) AS k3,
       CAST(fetch_offset_ms AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS p
FROM a
UNION ALL
SELECT stat, CAST(k1 AS VARCHAR), CAST(k2 AS VARCHAR),
       CAST(k3 AS VARCHAR), CAST(NULL AS BIGINT), CAST(p AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# geofam_audit = geo_assign + geo_rollup_join


def q_geofam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_geo_rollup_join
    from .registry_r11 import q_geo_assign
    from .session import overlap_builds

    # independent legs — overlap their eager builds (guide §2.6)
    a_raw, b_raw = overlap_builds(
        lambda: q_geo_assign(spark, sf_dir),
        lambda: q_geo_rollup_join(spark, sf_dir),
    )
    a = a_raw.select(
        F.lit("assign").alias("stat"),
        F.col("pid").cast(_L).alias("id"),
        F.col("region").cast(_S).alias("k1"),
        F.lit(None).cast(_S).alias("k2"),
        F.lit(None).cast(_L).alias("n"),
        F.col("lon").cast(_D).alias("x"),
        F.col("lat").cast(_D).alias("y"),
    )
    b = b_raw.select(
        F.lit("rollup").alias("stat"),
        F.lit(None).cast(_L).alias("id"),
        F.col("region").cast(_S).alias("k1"),
        F.col("r_name").cast(_S).alias("k2"),
        F.col("n_submissions").cast(_L).alias("n"),
        F.col("mean_acctbal").cast(_D).alias("x"),
        F.lit(None).cast(_D).alias("y"),
    )
    return a.unionByName(b)


def _sql_geofam_audit() -> str:
    from .registry_misc import SQL_GEO_ROLLUP_JOIN
    from .registry_r11 import _sql_geo_assign

    return f"""
WITH a AS ({_sql_geo_assign()}),
b AS ({SQL_GEO_ROLLUP_JOIN})
SELECT 'assign' AS stat, CAST(pid AS BIGINT) AS id,
       CAST(region AS VARCHAR) AS k1, CAST(NULL AS VARCHAR) AS k2,
       CAST(NULL AS BIGINT) AS n, CAST(lon AS DOUBLE) AS x,
       CAST(lat AS DOUBLE) AS y
FROM a
UNION ALL
SELECT 'rollup', CAST(NULL AS BIGINT), CAST(region AS VARCHAR),
       CAST(r_name AS VARCHAR), CAST(n_submissions AS BIGINT),
       CAST(mean_acctbal AS DOUBLE), CAST(NULL AS DOUBLE)
FROM b
"""


SPARK_QUERIES = {
    "crawlfam_audit": q_crawlfam_audit,
    "geofam_audit": q_geofam_audit,
}


def build_oracle_sql() -> dict[str, str]:
    return {
        "crawlfam_audit": _sql_crawlfam_audit(),
        "geofam_audit": _sql_geofam_audit(),
    }


# names the in-round consolidations replace at registration time
AUDIT_REPLACES = {
    "crawlfam_audit": ("fetch_audit", "crawl_audit"),
    "geofam_audit": ("geo_assign", "geo_rollup_join"),
}
