"""Point-in-polygon ray cast + region assignment: textbook cases,
concavity, GeoJSON ring parsing, broadcast plan, DuckDB parity."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import geo


def _ring_df(spark, pts, ring):
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, lon double, lat double")
    ring_lit = F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in ring
        ]
    )
    return df.select(
        "pid", geo.point_in_polygon(F.col("lon"), F.col("lat"), ring_lit).alias("inside")
    )


def test_unit_square_and_concave(spark):
    square = [(0, 0), (4, 0), (4, 4), (0, 4)]
    pts = [(2, 2), (5, 2), (-1, 2), (2, 5), (3.999, 3.999)]
    got = {r.pid: r.inside for r in _ring_df(spark, pts, square).collect()}
    assert got == {0: True, 1: False, 2: False, 3: False, 4: True}

    # concave "C": the notch (3,2) is OUTSIDE though the bbox contains it
    cshape = [(0, 0), (4, 0), (4, 1), (2, 1), (2, 3), (4, 3), (4, 4), (0, 4)]
    pts = [(1, 2), (3, 2), (3, 0.5), (3, 3.5)]
    got = {r.pid: r.inside for r in _ring_df(spark, pts, cshape).collect()}
    assert got == {0: True, 1: False, 2: True, 3: True}

    # closed ring (duplicated final vertex) gives identical answers
    closed = square + [square[0]]
    a = {r.pid: r.inside for r in _ring_df(spark, pts, square).collect()}
    b = {r.pid: r.inside for r in _ring_df(spark, pts, closed).collect()}
    assert a == b


def test_assign_regions_from_geojson(spark):
    def poly(name, ring):
        return (name, json.dumps({"type": "Polygon", "coordinates": [ring]}))

    regions = spark.createDataFrame(
        [
            poly("west", [[0, 0], [2, 0], [2, 4], [0, 4], [0, 0]]),
            poly("east", [[2, 0], [4, 0], [4, 4], [2, 4], [2, 0]]),
        ],
        "region string, geometry_json string",
    )
    points = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 3.0, 3.0), (3, 9.0, 9.0)],
        "pid long, lon double, lat double",
    )
    out = geo.assign_regions(points, regions)
    got = {r.pid: r.region for r in out.collect()}
    assert got == {1: "west", 2: "east", 3: None}
    # the dim is broadcast and nothing falls to Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shared_border_matches_at_most_one_region(spark):
    def poly(name, ring):
        return (name, json.dumps({"type": "Polygon", "coordinates": [ring]}))

    regions = spark.createDataFrame(
        [
            poly("a", [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]),
            poly("b", [[2, 0], [4, 0], [4, 2], [2, 2], [2, 0]]),
        ],
        "region string, geometry_json string",
    )
    border = spark.createDataFrame(
        [(1, 2.0, 1.0)], "pid long, lon double, lat double"
    )
    got = geo.assign_regions(border, regions).collect()
    assert len(got) == 1  # half-open edges: never double-assigned


def test_ray_cast_duckdb_parity(spark):
    """The crossing arithmetic is IEEE +,−,×,÷ only, so DuckDB's
    list_reduce replay decides identically for every point."""
    import duckdb

    ring = [(0.3, 0.1), (3.7, 0.4), (4.1, 2.9), (1.9, 4.2), (-0.2, 2.5)]
    pts = [
        (i, 0.37 * i % 5 - 0.3, 0.53 * i % 5 - 0.2) for i in range(200)
    ]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    ring_lit = F.array(
        *[
            F.struct(F.lit(x).alias("x"), F.lit(y).alias("y"))
            for x, y in ring
        ]
    )
    got = {
        r.pid: r.inside
        for r in df.select(
            "pid", geo.point_in_polygon(F.col("x"), F.col("y"), ring_lit).alias("inside")
        ).collect()
    }
    ring_sql = "[" + ", ".join(f"{{'x': {x}, 'y': {y}}}" for x, y in ring) + "]"
    vals = ", ".join(f"({i}, {x}, {y})" for i, x, y in pts)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH p(pid, px, py) AS (VALUES {vals}),
        ring AS (SELECT {ring_sql}::STRUCT(x DOUBLE, y DOUBLE)[] AS r)
        SELECT pid,
               list_reduce(
                 list_transform(generate_series(1, len(r)), i ->
                   CASE WHEN ((r[i].y > py) != (r[CASE WHEN i = len(r) THEN 1 ELSE i + 1 END].y > py))
                         AND (px < (r[CASE WHEN i = len(r) THEN 1 ELSE i + 1 END].x - r[i].x)
                                   * (py - r[i].y)
                                   / (r[CASE WHEN i = len(r) THEN 1 ELSE i + 1 END].y - r[i].y)
                                   + r[i].x)
                        THEN 1 ELSE 0 END),
                 (a, b) -> a + b) % 2 = 1 AS inside
        FROM p, ring
        """
    ).fetchall()
    con.close()
    want = {pid: inside for pid, inside in rows}
    assert got == want and sum(got.values()) > 10  # nontrivial mix


def test_haversine_known_distances(spark):
    # Maputo (32.573, -25.966) to Beira (34.838, -19.844): ~717 km
    df = spark.createDataFrame([(1,)], "id long")
    d = df.select(
        geo.haversine_m(
            F.lit(32.573), F.lit(-25.966), F.lit(34.838), F.lit(-19.844)
        ).alias("d")
    ).first().d
    assert abs(d - 717_000) < 15_000
    # zero distance and ~111.2 km per degree of latitude
    z = df.select(
        geo.haversine_m(F.lit(10.0), F.lit(5.0), F.lit(10.0), F.lit(5.0)).alias("d")
    ).first().d
    assert z == 0.0
    one_deg = df.select(
        geo.haversine_m(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)).alias("d")
    ).first().d
    assert abs(one_deg - 111_195) < 200


def test_nearest_site_assignment_and_range_gate(spark):
    sites = spark.createDataFrame(
        [("porto_a", 32.60, -25.90), ("porto_b", 34.80, -19.80)],
        "site string, site_lon double, site_lat double",
    )
    points = spark.createDataFrame(
        [
            (1, 32.61, -25.91),   # near porto_a
            (2, 34.81, -19.81),   # near porto_b
            (3, 40.00, -12.00),   # far from both
        ],
        "pid long, lon double, lat double",
    )
    out = geo.nearest_site(points, sites, max_distance_m=50_000)
    got = {r.pid: (r.site, r.site_distance_m) for r in out.collect()}
    assert got[1][0] == "porto_a" and got[1][1] < 5_000
    assert got[2][0] == "porto_b" and got[2][1] < 5_000
    assert got[3] == (None, None)  # out of range stays unassigned
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nearest_site_empty_sites_keeps_every_point(spark):
    """ADVICE r13: an empty site dim must not evaporate the input —
    every point survives with NULL site columns / site_distance_m
    (the documented unassigned contract), with and without the range
    gate and the id_col argmin key."""
    sites = spark.createDataFrame(
        [], "site string, site_lon double, site_lat double"
    )
    points = spark.createDataFrame(
        [(1, 32.61, -25.91), (2, 34.81, -19.81)],
        "pid long, lon double, lat double",
    )
    for kwargs in (
        {},
        {"max_distance_m": 50_000},
        {"id_col": "pid"},
        {"id_col": "pid", "max_distance_m": 50_000},
    ):
        out = geo.nearest_site(points, sites, **kwargs)
        got = {r.pid: (r.site, r.site_distance_m) for r in out.collect()}
        assert got == {1: (None, None), 2: (None, None)}, kwargs


def test_nearest_site_id_col_keeps_duplicate_points(spark):
    """With id_col the argmin keys on the id alone: duplicate
    coordinate rows each keep their output row (VERDICT r11)."""
    sites = spark.createDataFrame(
        [("porto_a", 32.60, -25.90)],
        "site string, site_lon double, site_lat double",
    )
    points = spark.createDataFrame(
        [(1, 32.61, -25.91), (2, 32.61, -25.91)],  # identical coords
        "pid long, lon double, lat double",
    )
    out = geo.nearest_site(points, sites, id_col="pid")
    rows = {r.pid: r.site for r in out.collect()}
    assert rows == {1: "porto_a", 2: "porto_a"}


def test_nearest_site_exact_tie_breaks_deterministically(spark):
    """Two sites at the SAME spot: the tie breaks on the kept site
    columns (struct lexicographic min), not on partition layout
    (ADVICE r11 #4)."""
    sites = spark.createDataFrame(
        [("zulu", 32.60, -25.90), ("alpha", 32.60, -25.90)],
        "site string, site_lon double, site_lat double",
    )
    points = spark.createDataFrame(
        [(1, 32.61, -25.91)], "pid long, lon double, lat double"
    )
    for nparts in (1, 3, 7):
        out = geo.nearest_site(
            points.repartition(nparts), sites, id_col="pid"
        )
        assert out.first().site == "alpha"


def test_assign_regions_polygon_with_hole(spark):
    """Even-odd over the full ring set: a point inside a hole is
    OUTSIDE the region; points between the hole and the exterior are
    inside (RFC 7946 §3.1.6)."""
    import json

    donut = json.dumps({
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
            [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]],
        ],
    })
    regions = spark.createDataFrame(
        [("donut", donut)], "region string, geometry_json string"
    )
    points = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0), (3, 11.0, 5.0)],
        "pid long, lon double, lat double",
    )
    got = {r.pid: r.region for r in geo.assign_regions(points, regions).collect()}
    assert got == {1: "donut", 2: None, 3: None}


def test_assign_regions_multipolygon(spark):
    """Any MultiPolygon part assigns; the gap between parts does not."""
    import json

    two_parts = json.dumps({
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]],
            [[[8.0, 8.0], [9.0, 8.0], [9.0, 9.0], [8.0, 9.0], [8.0, 8.0]]],
        ],
    })
    regions = spark.createDataFrame(
        [("arch", two_parts)], "region string, geometry_json string"
    )
    points = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 8.5, 8.5), (3, 5.0, 5.0)],
        "pid long, lon double, lat double",
    )
    got = {r.pid: r.region for r in geo.assign_regions(points, regions).collect()}
    assert got == {1: "arch", 2: "arch", 3: None}
    plan = geo.assign_regions(points, regions)._jdf.queryExecution()
    assert "BatchEvalPython" not in plan.executedPlan().toString()


def test_nearest_site_single_exchange_no_join_back(spark):
    """The argmin keeps every point in ONE aggregate (range gate after
    the min) — no row-grain sort-merge join-back; the only join is the
    broadcast of the site dim."""
    import contextlib
    import io

    points = spark.createDataFrame(
        [(i, 30.0 + i / 10.0, -20.0) for i in range(50)],
        "pid long, lon double, lat double",
    )
    sites = spark.createDataFrame(
        [("a", 30.0, -20.0), ("b", 33.0, -20.0)],
        "site string, site_lon double, site_lat double",
    )
    out = geo.nearest_site(
        points, sites, id_col="pid", max_distance_m=100_000.0,
        keep_site_cols=["site"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
