from __future__ import annotations

import datetime

import pytest

from peskas_mozambique_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_basic_latest_prior(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), "c1"),
         ("u1", _ts("2024-01-01 12:00:00"), "c2")],
        "user string, ts timestamp, click string",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), "v1"),
         ("u1", _ts("2024-01-01 11:00:00"), "v2"),
         ("u1", _ts("2024-01-01 13:00:00"), "v3")],
        "user string, ts timestamp, view string",
    )
    out = {r.click: r.view for r in asof_join(left, right, "ts", "user").collect()}
    assert out == {"c1": "v1", "c2": "v2"}  # never the future v3


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([("u1", _ts("2024-01-01 10:00:00"), "c1")],
                                 "user string, ts timestamp, click string")
    right = spark.createDataFrame([("u1", _ts("2024-01-01 10:00:00"), "v1")],
                                  "user string, ts timestamp, view string")
    out = asof_join(left, right, "ts", "user").first()
    assert out.view == "v1"  # <= semantics: same-instant right row visible


def test_asof_no_prior_is_null_and_keys_isolate(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 08:00:00"), "c1"),
         ("u2", _ts("2024-01-01 12:00:00"), "c2")],
        "user string, ts timestamp, click string",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), "v1")],
        "user string, ts timestamp, view string",
    )
    got = {r.click: r.view for r in asof_join(left, right, "ts", "user").collect()}
    # c1 is before any view; u2 never sees u1's views
    assert got == {"c1": None, "c2": None}


def test_asof_rejects_column_collision(spark):
    left = spark.createDataFrame([("u1", _ts("2024-01-01 08:00:00"), "x")],
                                 "user string, ts timestamp, v string")
    right = spark.createDataFrame([("u1", _ts("2024-01-01 07:00:00"), "y")],
                                  "user string, ts timestamp, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "ts", "user")


def test_asof_null_attr_comes_from_same_row(spark):
    """All carried columns must come from the SAME right row: a NULL
    attribute on the latest right row stays NULL, never backfilled from
    an older row (matches DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00"), "c1")],
        "user string, ts timestamp, click string",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), "old", 1),
         ("u1", _ts("2024-01-01 11:00:00"), None, 2)],
        "user string, ts timestamp, view string, vnum int",
    )
    out = asof_join(left, right, "ts", "user").first()
    assert out.vnum == 2
    assert out.view is None  # latest row's NULL, not v='old' from 09:00
