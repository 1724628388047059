"""Deterministic sketch operators: HLL distinct counts, count-min
frequencies — accuracy bounds, determinism, fixed-size state."""

from __future__ import annotations

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import sketches as sk


def _values(spark, n_distinct, copies=1):
    rows = [(f"v{i % n_distinct}",) for i in range(n_distinct * copies)]
    return spark.createDataFrame(rows, "val string")


def test_hll_estimate_within_error_bound(spark):
    # 1.04/sqrt(256) ~ 6.5% expected; assert a generous 20% envelope
    for n in (100, 1000, 5000):
        df = _values(spark, n, copies=2)  # duplicates must not inflate
        regs = sk.hll_registers(df, "val")
        est = sk.hll_estimate(regs).first()["hll_distinct"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_register_table_is_bounded_and_deterministic(spark):
    df = _values(spark, 10000)
    regs = sk.hll_registers(df, "val")
    assert regs.count() <= sk.HLL_M  # fixed-size state, any cardinality
    a = sk.hll_estimate(regs).first()["hll_distinct"]
    b = sk.hll_estimate(
        sk.hll_registers(df.repartition(13), "val")
    ).first()["hll_distinct"]
    assert a == b  # bit-identical under repartitioning


def test_hll_small_range_correction(spark):
    # tiny cardinalities take the linear-counting branch and stay close
    df = _values(spark, 5)
    est = sk.hll_estimate(sk.hll_registers(df, "val")).first()["hll_distinct"]
    assert abs(est - 5) <= 1.0


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark):
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "val string")
    sketch = sk.cms_sketch(df, "val")
    assert sketch.count() <= 4 * 256  # d*w cells max
    top = df.groupBy("val").agg(F.count(F.lit(1)).alias("exact"))
    est = sk.cms_lookup(sketch, top.select("val"), "val")
    j = {r.val: (r.cms_count) for r in est.collect()}
    ex = {r.val: r.exact for r in top.collect()}
    for v, e in ex.items():
        assert j[v] >= e, v  # one-sided error
    # the heavy hitter's estimate is within the collision envelope:
    # expected overcount per row ~ N/w = 700/256 < 3; min over 4 rows
    # makes a 5% slack comfortable
    assert j["hot"] <= 500 * 1.05


def test_histogram_quantiles_close_to_exact(spark):
    # uniform 0..9999: estimates within one bin width of the exact
    # percentiles; deterministic under repartitioning
    df = spark.range(0, 10000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    est = {
        (r.g, r.quantile): r.estimate
        for r in sk.histogram_quantiles(
            df, "v", group_cols=["g"], n_bins=64, quantiles=(0.5, 0.95)
        ).collect()
    }
    assert len(est) == 4
    bin_w = 10000 / 64
    for (g, q), e in est.items():
        assert abs(e - q * 10000) <= bin_w + 2, (g, q, e)
    est2 = {
        (r.g, r.quantile): r.estimate
        for r in sk.histogram_quantiles(
            df.repartition(13), "v", group_cols=["g"], n_bins=64,
            quantiles=(0.5, 0.95),
        ).collect()
    }
    assert est == est2


def test_histogram_quantiles_degenerate_single_value(spark):
    df = spark.range(0, 50).select(
        F.lit("a").alias("g"), F.lit(7.0).alias("v")
    )
    out = sk.histogram_quantiles(df, "v", group_cols=["g"]).collect()
    assert {r.estimate for r in out} != set() and all(
        abs(r.estimate - 7.0) < 0.2 for r in out
    )
