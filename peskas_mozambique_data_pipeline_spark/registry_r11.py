"""Round-11 IN-ROUND registry rows (the registry_r10 precedent): one
consolidation union made WITHIN the rotating-in set funds one new
operator row, keeping the 50-row window arithmetic intact
(head 50 − 2 legs + 1 union + 1 new = 50; registry stays at 98).

* ``summary_audit`` = ``pricing_summary`` + ``rollup_summary``: both
  are lineitem grouped summaries (the flat pricing table and its
  ROLLUP supersets) — same fact, same grain family.  Each leg calls
  the ORIGINAL query function verbatim and the oracle wraps the
  ORIGINAL SQL in a CTE, so both operators stay hash-verified and
  drift is impossible.

* ``geo_assign`` puts the round-11 spatial surface
  (``operators/geo.py::assign_regions`` — even-odd ray cast, bbox
  prefilter, broadcast region dim) under the hard oracle.  Points
  synthesize deterministically from ``customer`` keys (IEEE division
  — both engines compute the identical double); three literal GeoJSON
  regions (a rectangle, a concave C, a triangle — plus uncovered gaps)
  are generated from ONE python list into BOTH the Spark frame and
  the DuckDB ring literals, so the fixtures cannot drift.  The oracle
  replays bbox + crossing parity with ``list_reduce`` — the predicate
  is +,−,×,÷ on doubles only, so decisions agree bit-for-bit
  (``tests/test_geo.py::test_ray_cast_duckdb_parity`` pins the same
  property on an independent fixture).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"


def _null(t: str):
    return F.lit(None).cast(t)


# ---------------------------------------------------------------------------
# summary_audit = pricing_summary + rollup_summary


def q_summary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import q_pricing_summary
    from .registry_misc import q_rollup_summary

    a = q_pricing_summary(spark, sf_dir).select(
        F.lit("pricing").alias("stat"),
        F.col("l_returnflag").cast(_S).alias("k1"),
        F.col("l_linestatus").cast(_S).alias("k2"),
        F.col("count_order").cast(_L).alias("n"),
        F.col("sum_qty").cast(_D).alias("v1"),
        F.col("sum_base_price").cast(_D).alias("v2"),
        F.col("sum_disc_price").cast(_D).alias("v3"),
        F.col("sum_charge").cast(_D).alias("v4"),
        F.col("avg_qty").cast(_D).alias("v5"),
        F.col("avg_price").cast(_D).alias("v6"),
    )
    b = q_rollup_summary(spark, sf_dir).select(
        F.lit("rollup").alias("stat"),
        F.col("l_returnflag").cast(_S).alias("k1"),
        F.col("l_linestatus").cast(_S).alias("k2"),
        F.col("n_rows").cast(_L).alias("n"),
        F.col("total_qty").cast(_D).alias("v1"),
        _null(_D).alias("v2"),
        _null(_D).alias("v3"),
        _null(_D).alias("v4"),
        _null(_D).alias("v5"),
        _null(_D).alias("v6"),
    )
    return a.unionByName(b)


def _sql_summary_audit() -> str:
    from .registry import SQL_PRICING_SUMMARY
    from .registry_misc import SQL_ROLLUP_SUMMARY

    return f"""
WITH a AS ({SQL_PRICING_SUMMARY}),
b AS ({SQL_ROLLUP_SUMMARY})
SELECT 'pricing' AS stat, CAST(l_returnflag AS VARCHAR) AS k1,
       CAST(l_linestatus AS VARCHAR) AS k2,
       CAST(count_order AS BIGINT) AS n,
       CAST(sum_qty AS DOUBLE) AS v1, CAST(sum_base_price AS DOUBLE) AS v2,
       CAST(sum_disc_price AS DOUBLE) AS v3, CAST(sum_charge AS DOUBLE) AS v4,
       CAST(avg_qty AS DOUBLE) AS v5, CAST(avg_price AS DOUBLE) AS v6
FROM a
UNION ALL
SELECT 'rollup', CAST(l_returnflag AS VARCHAR), CAST(l_linestatus AS VARCHAR),
       CAST(n_rows AS BIGINT), CAST(total_qty AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# geo_assign — ray-cast region assignment under the hard oracle.
# r12 upgrade: the fixture now exercises the FULL RFC 7946 surface the
# operator gained (operators/geo.py::polygon_rings/point_in_rings) —
# north carries a HOLE (points inside it must stay unassigned) and the
# new "isles" region is a two-part MultiPolygon — so the summed
# multi-ring crossing parity sits under the driver hash, not just the
# single-ring case.

# ONE source of truth for the fixture ring sets, rendered into both
# engines: region name → (geojson type, list of rings).
GEO_RINGS: dict[str, tuple[str, list[list[tuple[float, float]]]]] = {
    "north": (
        "Polygon",
        [
            [(31.0, -16.0), (39.0, -16.0), (39.0, -12.5), (31.0, -12.5)],
            # the hole: a lake in the middle of the north block
            [(34.0, -15.0), (36.0, -15.0), (36.0, -13.5), (34.0, -13.5)],
        ],
    ),
    "south_c": (
        "Polygon",
        [[
            (30.5, -25.5), (38.0, -25.5), (38.0, -23.0), (33.0, -23.0),
            (33.0, -20.0), (38.0, -20.0), (38.0, -18.0), (30.5, -18.0),
        ]],
    ),
    "east_tri": (
        "Polygon",
        [[(38.5, -22.0), (39.9, -24.0), (39.9, -20.0)]],
    ),
    "isles": (
        "MultiPolygon",
        [
            [(30.2, -17.4), (32.2, -17.4), (32.2, -16.4), (30.2, -16.4)],
            [(38.6, -17.4), (39.8, -17.4), (39.8, -16.4), (38.6, -16.4)],
        ],
    ),
}


def q_geo_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.geo import assign_regions
    from .session import read_table

    cust = read_table(spark, sf_dir, "customer")
    points = cust.select(
        F.col("c_custkey").alias("pid"),
        # multiplicative spread so even a 150-row scale factor covers
        # every fixture region (37, 53 coprime to the moduli)
        (F.lit(30.0) + (F.col("c_custkey") * 37 % 1000) / 100.0).alias("lon"),
        (F.lit(-26.0) + (F.col("c_custkey") * 53 % 700) / 50.0).alias("lat"),
    )

    def _close(ring):
        return [[x, y] for x, y in ring] + [[ring[0][0], ring[0][1]]]

    rows = []
    for name, (gtype, rings) in GEO_RINGS.items():
        if gtype == "Polygon":
            coords = [_close(r) for r in rings]
        else:  # MultiPolygon: each ring is its own single-ring part
            coords = [[_close(r)] for r in rings]
        rows.append((name, json.dumps({"type": gtype, "coordinates": coords})))
    regions = spark.createDataFrame(
        rows, "region string, geometry_json string"
    )
    out = assign_regions(points, regions)
    return out.select("pid", "lon", "lat", F.col("region").cast(_S).alias("region"))


def _sql_geo_assign() -> str:
    region_rows = []
    for name, (_gtype, rings) in GEO_RINGS.items():
        rings_sql = (
            "["
            + ", ".join(
                "["
                + ", ".join(f"{{'x': {x!r}, 'y': {y!r}}}" for x, y in ring)
                + "]"
                for ring in rings
            )
            + "]::STRUCT(x DOUBLE, y DOUBLE)[][]"
        )
        xs = [x for ring in rings for x, _ in ring]
        ys = [y for ring in rings for _, y in ring]
        region_rows.append(
            f"SELECT '{name}' AS region, {rings_sql} AS rs, "
            f"{min(xs)!r} AS xmin, {max(xs)!r} AS xmax, "
            f"{min(ys)!r} AS ymin, {max(ys)!r} AS ymax"
        )
    regions = " UNION ALL ".join(region_rows)
    # summed crossing parity over EVERY ring of the region (holes and
    # MultiPolygon parts alike) — exactly point_in_rings
    cross_one = (
        "list_reduce(list_transform(generate_series(1, len(rr)), i -> "
        "CASE WHEN ((rr[i].y > p.lat) "
        "!= (rr[CASE WHEN i = len(rr) THEN 1 ELSE i + 1 END].y > p.lat)) "
        "AND (p.lon < "
        "(rr[CASE WHEN i = len(rr) THEN 1 ELSE i + 1 END].x - rr[i].x) "
        "* (p.lat - rr[i].y) "
        "/ (rr[CASE WHEN i = len(rr) THEN 1 ELSE i + 1 END].y - rr[i].y) "
        "+ rr[i].x) THEN 1 ELSE 0 END), (a, b) -> a + b)"
    )
    return f"""
WITH points AS (
  SELECT c_custkey AS pid,
         30.0 + (c_custkey * 37 % 1000) / 100.0 AS lon,
         -26.0 + (c_custkey * 53 % 700) / 50.0 AS lat
  FROM customer
),
regions AS ({regions}),
hits AS (
  SELECT p.pid, r.region
  FROM points p, regions r
  WHERE p.lon >= r.xmin AND p.lon <= r.xmax
    AND p.lat >= r.ymin AND p.lat <= r.ymax
    AND list_reduce(
          list_transform(r.rs, rr -> {cross_one}),
          (a, b) -> a + b) % 2 = 1
)
SELECT p.pid, p.lon, p.lat, CAST(h.region AS VARCHAR) AS region
FROM points p LEFT JOIN hits h ON p.pid = h.pid
"""


SPARK_QUERIES = {
    "summary_audit": q_summary_audit,
    "geo_assign": q_geo_assign,
}


def build_oracle_sql() -> dict[str, str]:
    return {
        "summary_audit": _sql_summary_audit(),
        "geo_assign": _sql_geo_assign(),
    }


# names the in-round consolidation replaces at registration time
AUDIT_REPLACES = {
    "summary_audit": ("pricing_summary", "rollup_summary"),
}
