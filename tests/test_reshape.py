from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F

from peskas_mozambique_data_pipeline_spark.operators import reshape


def test_unpivot_then_pivot_roundtrip(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0), (2, 30.0, 40.0)], ["id", "m1", "m2"])
    long = reshape.unpivot(df, ["id"], ["m1", "m2"])
    assert long.count() == 4
    wide = reshape.pivot_wider(long, ["id"], "metric_type", "metric_value", ["m1", "m2"])
    back = sorted(tuple(r) for r in wide.collect())
    assert back == [(1, 10.0, 20.0), (2, 30.0, 40.0)]


def test_stack_length_bins_drops_empty(spark):
    # mirrors R/survey-reshaping.R:182-239: NA bins are dropped, values kept
    df = spark.createDataFrame(
        [("s1", 2.0, None, 5.0), ("s2", None, None, None)],
        "sid string, no_individuals_5_10 double, "
        "no_individuals_10_15 double, no_individuals_over60 double",
    )
    out = reshape.stack_length_bins(
        df, ["sid"],
        ["no_individuals_5_10", "no_individuals_10_15", "no_individuals_over60"],
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("s1", "5_10", 2.0), ("s1", "over60", 5.0)]


def test_explode_repeat_group_positional(spark):
    # ArrayType(StructType) repeat group -> 1-based n_catch position
    df = spark.createDataFrame(
        [Row(sid="s1", species_group=[Row(sp="A", n=1.0), Row(sp="B", n=2.0)]),
         Row(sid="s2", species_group=[])],
    )
    out = reshape.explode_repeat_group(df, "species_group", "n_catch")
    got = sorted((r.sid, r.n_catch, r.sp) for r in out.collect() if r.sp is not None)
    assert got == [("s1", 1, "A"), ("s1", 2, "B")]
    # empty repeat group keeps the submission (outer explode)
    assert out.filter(F.col("sid") == "s2").count() == 1


def test_explode_delimited(spark):
    df = spark.createDataFrame([("s1", "f1, f2,f3")], ["sid", "flags"])
    out = reshape.explode_delimited(df, "flags", "flag")
    assert sorted(r.flag for r in out.collect()) == ["f1", "f2", "f3"]


def test_complete_months_emits_missing_months(spark):
    df = spark.createDataFrame(
        [("d1", datetime.date(2024, 1, 1), 5.0), ("d1", datetime.date(2024, 4, 1), 7.0),
         ("d2", datetime.date(2024, 2, 1), 1.0)],
        ["district", "month", "v"],
    )
    out = reshape.complete_months(df, ["district"], "month")
    # spine is Jan..Apr (4 months) x 2 districts
    assert out.count() == 8
    missing = out.filter(F.col("v").isNull())
    assert missing.count() == 5


def test_rename_by_regex(spark):
    df = spark.createDataFrame([(1, 2)], ["group_general/a", "group_general/b"])
    out = reshape.rename_by_regex(df, r"^group_general/")
    assert out.columns == ["a", "b"]


def test_select_by_pattern(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["species_a", "species_b", "other"])
    out = reshape.select_by_pattern(df, starts="species_")
    assert out.columns == ["species_a", "species_b"]


def test_over100_extraction_pattern(spark):
    # R5 (R/survey-reshaping.R:326-449): over-100cm lengths live in their
    # own repeat columns where the VALUE is the length (count := 1); new
    # rows are numbered after the existing per-submission max n_catch.
    from peskas_mozambique_data_pipeline_spark.operators.windows import renumber_from_max

    df = spark.createDataFrame(
        [("s1", 2, 105.0, 112.0), ("s2", 1, None, None)],
        "sid string, max_n_catch int, fish_length_over100_1 double, "
        "fish_length_over100_2 double",
    )
    long = reshape.unpivot(
        df, ["sid", "max_n_catch"],
        ["fish_length_over100_1", "fish_length_over100_2"],
        "slot", "length",
    ).filter(F.col("length").isNotNull()).withColumn("count", F.lit(1.0))
    out = renumber_from_max(long, ["sid"], "max_n_catch", ["length"], "n_catch")
    got = sorted((r.sid, r.n_catch, r.length, r["count"]) for r in out.collect())
    assert got == [("s1", 3, 105.0, 1.0), ("s1", 4, 112.0, 1.0)]


def test_stack_length_bins_drops_zero_counts(spark):
    # reference drops value == "0" bins too (R/preprocessing-surveys.R:572)
    df = spark.createDataFrame(
        [("s1", "0", "3")],
        "sid string, no_individuals_5_10 string, no_individuals_10_15 string",
    )
    cols = ["no_individuals_5_10", "no_individuals_10_15"]
    got = sorted(tuple(r) for r in reshape.stack_length_bins(df, ["sid"], cols).collect())
    assert got == [("s1", "10_15", "3")]
    kept = reshape.stack_length_bins(df, ["sid"], cols, drop_zero=False)
    assert kept.count() == 2
