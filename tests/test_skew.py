"""Skew toolkit (operators/skew.py): salted join/agg equivalence with
their unsalted twins, plan-shape assertions, diagnosis stats, guards."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import skew


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _skewed(spark):
    # key 'hot' holds 80% of rows; five cold keys share the rest
    rows = [(i, "hot" if i % 5 else f"cold{i % 25}", i % 7) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, k string, v long")


def test_key_skew_stats_finds_the_hot_key(spark):
    df = _skewed(spark)
    top = skew.key_skew_stats(df, ["k"], top=3).collect()
    assert top[0].k == "hot" and top[0].n_rows == 1600
    assert top[0].frac == 0.8
    assert all(a.n_rows >= b.n_rows for a, b in zip(top, top[1:]))
    # diagnosis is TakeOrderedAndProject, not a global sort
    p = plan_of(skew.key_skew_stats(df, ["k"], top=3), "simple")
    assert "TakeOrderedAndProject" in p


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("cold5", 2), ("cold10", 3), ("nomatch", 9)],
        "k string, dim long",
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in skew.salted_join(big, small, ["k"], n_salts=4, how=how)
            .select("id", "k", "v", "dim")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in big.join(small, ["k"], how)
            .select("id", "k", "v", "dim")
            .collect()
        )
        assert got == want, how
    # the join key carries the salt (the skew actually fans out) and
    # the small side replicates via an explode, not a cartesian
    p = plan_of(skew.salted_join(big, small, ["k"], n_salts=4), "simple")
    assert "_salt" in p
    assert "Generate explode" in p
    assert "CartesianProduct" not in p


def test_salted_join_spreads_the_hot_key(spark):
    big = _skewed(spark)
    salted = big.withColumn("_salt", skew._salt_col(big, 8, None))
    per_salt = (
        salted.filter("k = 'hot'").groupBy("_salt").count().collect()
    )
    # the deterministic hash salt splits the hot key across all 8
    # buckets, none holding more than half the key's rows
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 800


def test_salted_join_rejects_outer_modes(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(df, df, ["k"], how="full_outer")


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    aggs = {
        "total": ("sum", "v"),
        "n": ("count", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    got = sorted(
        tuple(r)
        for r in skew.salted_agg(df, ["k"], aggs, n_salts=4)
        .select("k", "total", "n", "lo", "hi")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    )
    assert got == want
    # phase 1 groups by (k, _salt): the salt must appear in an exchange
    p = plan_of(skew.salted_agg(df, ["k"], aggs, n_salts=4))
    assert "_salt" in p


def test_salted_agg_rejects_nonalgebraic(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="algebraic"):
        skew.salted_agg(df, ["k"], {"xs": ("collect_list", "v")})


def test_salt_is_deterministic_across_reshuffles(spark):
    df = _skewed(spark)
    a = {
        r.id: r.s
        for r in df.withColumn("s", skew._salt_col(df, 8, ["id"])).collect()
    }
    resh = df.repartition(13)
    b = {
        r.id: r.s
        for r in resh.withColumn("s", skew._salt_col(resh, 8, ["id"])).collect()
    }
    assert a == b
