"""gap_fill_interpolate: spine bounds, LOCF, integer interpolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
    gap_fill_interpolate,
)


def _rows(df):
    return {
        (r["k"], r["day"].isoformat()): (r["value_q"], r["locf_q"], r["interp_q"])
        for r in df.collect()
    }


def test_gap_fill_interpolates_and_carries_forward(spark):
    obs = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 100),
            ("a", dt.date(2024, 1, 4), 400),  # 2-day gap: 100 -> 400
            ("a", dt.date(2024, 1, 6), 200),
            ("b", dt.date(2024, 2, 10), 50),
        ],
        "k string, day date, v long",
    )
    out = gap_fill_interpolate(obs, ["k"], "day", "v")
    got = _rows(out)

    # spine covers exactly each key's observed range
    assert len(got) == 6 + 1
    assert ("a", "2023-12-31") not in got and ("a", "2024-01-07") not in got

    # observed days: all three columns equal the observation
    assert got[("a", "2024-01-01")] == (100, 100, 100)
    assert got[("a", "2024-01-04")] == (400, 400, 400)

    # interior gap: LOCF holds the left value, interpolation is linear
    # (100 + (400-100)*1/3 = 200; *2/3 = 300 — exact integers)
    assert got[("a", "2024-01-02")] == (None, 100, 200)
    assert got[("a", "2024-01-03")] == (None, 100, 300)

    # gap with truncating division: 400 -> 200 over 2 days -> 300
    assert got[("a", "2024-01-05")] == (None, 400, 300)

    # single-observation key densifies to a single row
    assert got[("b", "2024-02-10")] == (50, 50, 50)


def test_gap_fill_truncates_toward_zero_on_negative_deltas(spark):
    # -7 // 2 must be -3 (toward zero) in both engines; 10 -> 3 over 2
    # days: delta -7, midpoint 10 + (-7*1)//2 = 10 - 3 = 7
    obs = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 10), ("a", dt.date(2024, 1, 3), 3)],
        "k string, day date, v long",
    )
    out = gap_fill_interpolate(obs, ["k"], "day", "v")
    mid = [r for r in out.collect() if r["day"] == dt.date(2024, 1, 2)][0]
    assert mid["interp_q"] == 7


def test_gap_fill_is_one_shuffle_no_join(spark):
    """The lead()-derived spine needs exactly ONE Exchange (the window
    partitionBy) and no join at all — the naive bounds-agg + spine +
    left-join formulation costs four shuffles; regression-guard the
    cheap shape."""
    obs = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 10), ("a", dt.date(2024, 1, 5), 3)],
        "k string, day date, v long",
    )
    out = gap_fill_interpolate(obs, ["k"], "day", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchange = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan
