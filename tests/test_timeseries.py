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


def test_rolling_zscore_trailing_window_excludes_current(spark):
    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        rolling_zscore,
    )

    # alternating baseline (positive variance) then a spike
    rows = [("a", i, 10 if i % 2 == 0 else 12) for i in range(10)]
    rows.append(("a", 10, 100))
    df = spark.createDataFrame(rows, "k string, d int, v long")
    out = rolling_zscore(df, ["k"], "d", "v", window=28, min_obs=8)
    got = {r.d: (r.n_obs, r.zscore) for r in out.collect()}
    # first 8 rows: fewer than min_obs trailing rows -> NULL
    for d in range(8):
        assert got[d][1] is None
    # the spike scores high and the window counted 10 trailing rows
    assert got[10][0] == 10 and got[10][1] > 10
    # baseline excludes the current row: day 9's z uses days 0-8 only
    base = [10 if i % 2 == 0 else 12 for i in range(9)]
    mean = sum(base) / 9
    var = sum((x - mean) ** 2 for x in base) / 9
    expect = round((12 - mean) / var**0.5, 6)
    assert abs(got[9][1] - expect) < 1e-9


def test_rolling_zscore_zero_variance_is_null(spark):
    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        rolling_zscore,
    )

    df = spark.createDataFrame(
        [("a", i, 5) for i in range(12)], "k string, d int, v long"
    )
    out = rolling_zscore(df, ["k"], "d", "v", window=28, min_obs=8)
    assert all(r.zscore is None for r in out.collect())


def test_time_weighted_mean_hand_computed(spark):
    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        time_weighted_mean,
    )

    # u1: value 10 holds 10 s, value 20 holds 30 s, last event weightless
    # -> (10*10 + 20*30) / 40 = 17.5
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0, 1),
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 20.0, 2),
            (1, dt.datetime(2024, 1, 1, 0, 0, 40), 99.0, 3),
            (2, dt.datetime(2024, 1, 1, 0, 0, 0), 5.0, 4),  # lone event
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = {
        r["user_id"]: r
        for r in time_weighted_mean(
            ev, ["user_id"], "ts", "value", order_tiebreak="event_id"
        ).collect()
    }
    assert out[1]["tw_mean"] == 17.5
    assert out[1]["total_dur_s"] == 40
    assert out[1]["n_obs"] == 3
    # a key whose only event has no successor carries zero duration and
    # is filtered (no defined time-weighted mean)
    assert 2 not in out


def test_time_weighted_mean_tiebreak_is_deterministic(spark):
    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        time_weighted_mean,
    )

    # two events at the SAME ts: event_id order decides which value
    # holds for the following 10 s (the first gets 0 s)
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, 100.0, 2),
            (1, t0, 10.0, 1),
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 0.0, 3),
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    row = time_weighted_mean(
        ev, ["user_id"], "ts", "value", order_tiebreak="event_id"
    ).collect()[0]
    # event_id=1 (value 10) holds 0 s; event_id=2 (value 100) holds 10 s
    assert row["tw_mean"] == 100.0
