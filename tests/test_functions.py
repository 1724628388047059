from __future__ import annotations

import math

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.functions import (
    coalesce_cols,
    flag_concat,
    normalize_name,
    recode,
    row_sum,
    safe_div,
    strip_suffix_underscores,
    title_case_clean,
)
from peskas_mozambique_data_pipeline_spark.functions.columns import non_null_any


def test_recode_map_with_default(spark):
    df = spark.createDataFrame([("1",), ("2",), ("9",), (None,)], ["habitat"])
    out = df.select(
        recode("habitat", {"1": "reef", "2": "mangrove"}, default=F.lit("other")).alias("h")
    )
    assert [r.h for r in out.collect()] == ["reef", "mangrove", "other", "other"]


def test_coalesce_cols_picks_first_non_null(spark):
    df = spark.createDataFrame([(None, "b", "c"), ("a", None, None), (None, None, None)],
                               ["x", "y", "z"])
    vals = [r.v for r in df.select(coalesce_cols("x", "y", "z").alias("v")).collect()]
    assert vals == ["b", "a", None]


def test_row_sum_na_rm_semantics(spark):
    # R rowSums(na.rm=TRUE): NA treated as 0, all-NA row -> 0 (not NULL)
    df = spark.createDataFrame(
        [(1.0, None, 2.0), (None, None, None)], "a double, b double, c double"
    )
    vals = [r.s for r in df.select(row_sum("a", "b", "c").alias("s")).collect()]
    assert vals == [3.0, 0.0]


def test_safe_div_zero_yields_null_not_inf(spark):
    df = spark.createDataFrame([(1.0, 0.0), (4.0, 2.0), (1.0, None)], ["n", "d"])
    vals = [r.q for r in df.select(safe_div(F.col("n"), F.col("d")).alias("q")).collect()]
    assert vals == [None, 2.0, None]
    assert not any(v is not None and math.isinf(v) for v in vals)


def test_flag_concat_skips_nulls_and_all_null_is_null(spark):
    df = spark.createDataFrame(
        [("f1", None, "f3"), (None, None, None)], "a string, b string, c string"
    )
    vals = [r.f for r in df.select(flag_concat("a", "b", "c").alias("f")).collect()]
    assert vals == ["f1, f3", None]


def test_strip_suffix_underscores(spark):
    df = spark.createDataFrame([("3_",), ("12",), ("5__",)], ["n"])
    vals = [r.v for r in df.select(strip_suffix_underscores("n").alias("v")).collect()]
    assert vals == [3.0, 12.0, 5.0]


def test_normalize_name_reference_rules(spark):
    # single token -> undefined; spaces removed; case/punct stripped
    df = spark.createDataFrame(
        [("JOAO  da Silva3",), ("Maria",), ("",), (None,)], ["name"]
    )
    vals = [r.v for r in df.select(normalize_name("name").alias("v")).collect()]
    assert vals == ["joaodasilva", "undefined", None, None]


def test_title_case_clean(spark):
    df = spark.createDataFrame([("mocimboa_da_praia",)], ["d"])
    assert df.select(title_case_clean("d").alias("v")).first().v == "Mocimboa Da Praia"


def test_non_null_any(spark):
    df = spark.createDataFrame([(None, "x"), (None, None)], "a string, b string")
    out = df.filter(non_null_any(["a", "b"]))
    assert out.count() == 1
