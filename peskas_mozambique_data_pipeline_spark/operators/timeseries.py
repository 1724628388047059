"""Time-series densification with gap filling: per-key daily spine +
forward fill (LOCF) + integer-exact linear interpolation.

The reference densifies monthly metric series before export
(R/export.R:136-151 `complete(date, nesting(...))` — the
`complete_months` operator covers that exact shape); this module is the
general daily-grain version a curated feature store needs: missing
days between two observations get a linearly interpolated value,
trailing gaps get last-observation-carried-forward, leading gaps stay
NULL.  That is `pandas.Series.interpolate(method="time")` +
`ffill()` re-expressed declaratively — no UDF, no driver-side loop.

Shape: the naive plan is bounds-agg → sequence() spine → left join
observations → two window frames — four shuffles.  Here the spine is
derived FROM each observation instead: ``lead(day)`` pairs every
observation with its successor, ``sequence(day, next_day − 1)``
explodes the gap days locally, and LOCF/interpolation are computed
from the pair the row was exploded from.  One shuffle total (the
window's partitionBy key), no join, no bounds pass; the explode is
narrow and each key's cost is its own observed range.

Engine-exactness: values are integer units and the interpolation is
``prev + (next - prev) * (day - prev_day) DIV (next_day - prev_day)``
— all BIGINT arithmetic (Spark ``div`` and DuckDB ``//`` both truncate
toward zero, verified including negative deltas), so the oracle
replays it bit-for-bit.  The sub-unit truncation error is irrelevant
to analytics and essential to cross-engine determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_interpolate(
    observed: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    value_q_col: str,
) -> DataFrame:
    """Densify ``observed`` (one row per key+day, BIGINT quantized
    value) to every day between each key's first and last observation.

    Returns key_cols + (day, value_q, locf_q, interp_q):
      - ``value_q``  — the observation, NULL on filled days
      - ``locf_q``   — last observation carried forward
      - ``interp_q`` — linear interpolation between the neighbouring
        observations (equals value_q on observed days; NULL on
        leading/trailing gaps, where there is no bracket — leading
        gaps never materialize because the spine starts at each key's
        first observation)
    """
    keys = list(key_cols)
    obs = observed.select(
        *keys, F.col(day_col).alias("_obs_day"), F.col(value_q_col).alias("_obs_val")
    )
    w = Window.partitionBy(*keys).orderBy("_obs_day")
    paired = obs.select(
        *keys,
        "_obs_day",
        "_obs_val",
        F.lead("_obs_day").over(w).alias("_next_day"),
        F.lead("_obs_val").over(w).alias("_next_val"),
    )
    # each observation owns the half-open span [day, next_day); the
    # last observation owns just itself — together exactly the spine
    span = paired.select(
        *keys,
        "_obs_day",
        "_obs_val",
        "_next_day",
        "_next_val",
        F.explode(
            F.sequence(
                "_obs_day",
                F.coalesce(F.date_sub("_next_day", 1), F.col("_obs_day")),
            )
        ).alias("day"),
    )
    is_obs = F.col("day") == F.col("_obs_day")
    interp = F.when(is_obs, F.col("_obs_val")).when(
        F.col("_next_val").isNotNull(),
        F.col("_obs_val")
        + F.expr(
            "(_next_val - _obs_val) * datediff(day, _obs_day)"
            " div datediff(_next_day, _obs_day)"
        ),
    )
    return span.select(
        *keys,
        "day",
        F.when(is_obs, F.col("_obs_val")).alias("value_q"),
        F.col("_obs_val").alias("locf_q"),
        interp.alias("interp_q"),
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_q_col: str,
    window: int = 28,
    min_obs: int = 8,
) -> DataFrame:
    """Per-key rolling z-score against the TRAILING window (the
    current row excluded — an anomaly must not dilute its own
    baseline): classic series anomaly scoring for ops metrics and
    corpus-drift monitors.

    Sum and sum-of-squares accumulate in exact BIGINT (the value is
    pre-quantized by the caller), so the only float work is the final
    mean/variance/z expression — written in the identical shape on
    both engines and rounded to 6 decimals, per the repo's
    transcendental-math rule.  One shuffle (the key partition); both
    frames ride the same Window spec.

    Returns input + (n_obs, zscore); zscore is NULL when the trailing
    window has fewer than ``min_obs`` rows or zero variance.
    """
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_q_col)
    out = df.select(
        "*",
        F.count(v).over(w).alias("_n"),
        F.sum(v).over(w).alias("_s"),
        F.sum(v * v).over(w).alias("_q"),
    )
    mean = F.col("_s") / F.col("_n")
    var = F.col("_q") / F.col("_n") - mean * mean
    z = F.round((v - mean) / F.sqrt(var), 6)
    return out.select(
        *df.columns,
        F.col("_n").alias("n_obs"),
        F.when((F.col("_n") >= min_obs) & (var > 0), z).alias("zscore"),
    )


def time_weighted_mean(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Interval-weighted mean per key (the TWAP shape): each
    observation's value holds until the key's next observation, and the
    mean weights values by their holding duration in whole seconds —
    the correct average for irregularly-sampled state (a sensor that
    reports on change, a price that ticks sporadically).  A plain AVG
    over-weights bursty periods; this does not.

    Engine-exact arithmetic: values quantize to integer micro-units
    and durations to whole seconds BEFORE the weighted sum, so both
    sums are exact integers on any engine (order-free); only the final
    division is floating point, on identical operands.  Magnitudes:
    |value| ≤ ~9e9 with year-long holds stays inside BIGINT; beyond
    that, escalate the sum to decimal(38,0) — noted, not needed for
    survey-scale values.

    Sub-second resolution: durations TRUNCATE to whole seconds
    (``_dur_us div 1_000_000``), so a hold shorter than 1 s weighs
    ZERO, and a key whose every gap is sub-second has total_dur_s == 0
    and is dropped by the output filter entirely.  That is the
    documented contract for this operator (tick data at second-plus
    cadence); for genuinely sub-second streams, weight in micro-units
    instead — BIGINT micro-second sums hold ~292k years of duration,
    so the only cost is re-deriving the oracle's constants.

    Scale shape: one shuffle — the per-key window that pairs each
    observation with its successor (``lead``); the weighted sum reuses
    the same partitioning (groupBy on the window's partition keys, a
    map-side-combinable agg with no second exchange of the raw rows).
    The last observation per key has no successor and carries zero
    weight (open-ended holds are policy; cap with a sentinel row
    upstream if needed).

    Returns keys + (n_obs, total_dur_s, tw_mean).
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    paired = df.select(
        *keys,
        F.col(ts_col),
        F.floor(F.col(value_col) * F.lit(1e6)).cast("long").alias("_vq"),
        (
            (F.lead(us).over(w) - us)
            .cast("long")
        ).alias("_dur_us"),
    ).withColumn(
        "_dur_s", F.expr("_dur_us div 1000000").cast("long")
    )
    return (
        paired.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.coalesce(F.sum("_dur_s"), F.lit(0)).alias("total_dur_s"),
            F.round(
                F.sum(F.col("_vq") * F.col("_dur_s"))
                / F.sum("_dur_s")
                / F.lit(1e6),
                6,
            ).alias("tw_mean"),
        )
        .filter(F.col("total_dur_s") > 0)
    )
