"""Privacy audits (operators/privacy.py): k-anonymity counts vs
python, NULL-QI class semantics, l-diversity, suppression exactness,
generalization kinds, and the one-shuffle plan shape."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import privacy as pv


def _fixture(spark):
    rows = [
        # (id, zip, age, diag)
        (1, "02138", 30, "flu"),
        (2, "02138", 30, "flu"),
        (3, "02138", 30, "cold"),
        (4, "02139", 41, "flu"),      # singleton class
        (5, None, 52, "cold"),        # NULL-zip class of 2
        (6, None, 52, None),          # NULL diag: no diversity credit
    ]
    return spark.createDataFrame(rows, "id long, zip string, age long, diag string")


def test_k_anonymity_report_matches_python(spark):
    rep = pv.k_anonymity_report(_fixture(spark), ["zip", "age"], k=2).collect()[0]
    assert rep.k_threshold == 2 and rep.n_rows == 6
    assert rep.n_classes == 3 and rep.min_class_size == 1
    assert rep.n_risky_classes == 1 and rep.n_risky_rows == 1
    risky = pv.risky_groups(_fixture(spark), ["zip", "age"], k=2).collect()
    assert [(r.zip, r.age, r.class_size) for r in risky] == [("02139", 41, 1)]


def test_k_anonymity_empty_input_reports_zeros(spark):
    empty = spark.createDataFrame([], "id long, zip string, age long, diag string")
    rep = pv.k_anonymity_report(empty, ["zip", "age"], k=5).collect()[0]
    assert (rep.n_rows, rep.n_classes, rep.min_class_size,
            rep.n_risky_classes, rep.n_risky_rows) == (0, 0, 0, 0, 0)


def test_l_diversity_null_sensitive_not_counted(spark):
    div = {
        (r.zip, r.age): (r.class_size, r.diversity, r.diverse)
        for r in pv.l_diversity_report(
            _fixture(spark), ["zip", "age"], "diag", 2
        ).collect()
    }
    assert div[("02138", 30)] == (3, 2, True)
    assert div[("02139", 41)] == (1, 1, False)
    # NULL diag contributes nothing: class of 2 has diversity 1
    assert div[(None, 52)] == (2, 1, False)


def test_suppress_rare_groups_null_safe(spark):
    kept = pv.suppress_rare_groups(_fixture(spark), ["zip", "age"], k=2)
    ids = sorted(r.id for r in kept.collect())
    # the singleton (02139, 41) drops; the NULL-zip class of 2 SURVIVES
    assert ids == [1, 2, 3, 5, 6]
    assert kept.columns == ["id", "zip", "age", "diag"]


def test_suppress_plan_single_aggregate_no_window(spark, tmp_path):
    src = str(tmp_path / "t")
    _fixture(spark).write.parquet(src)
    df = spark.read.parquet(src)
    plan = pv.suppress_rare_groups(df, ["zip", "age"], 2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_generalize_kinds_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(37, "02138-4307", datetime.date(2024, 5, 17)),
         (None, None, None)],
        "age long, zip string, d date",
    )
    out = pv.generalize(
        df, {"age": ("bin", 10), "zip": ("prefix", 3), "d": ("date_trunc", "month")}
    ).collect()
    assert (out[0].age, out[0].zip, out[0].d) == (
        30, "021", datetime.date(2024, 5, 1)
    )
    assert (out[1].age, out[1].zip, out[1].d) == (None, None, None)
    with pytest.raises(ValueError, match="unknown generalization"):
        pv.generalize(df, {"age": ("wat", 1)})


def test_generalize_then_audit_loop(spark):
    """The standard anonymization loop: coarsening QIs can only merge
    classes, so k never decreases."""
    df = _fixture(spark)
    before = pv.k_anonymity_report(df, ["zip", "age"], 2).collect()[0]
    gen = pv.generalize(df, {"zip": ("prefix", 3), "age": ("bin", 100)})
    after = pv.k_anonymity_report(gen, ["zip", "age"], 2).collect()[0]
    assert after.min_class_size >= before.min_class_size
    assert after.n_classes <= before.n_classes
    assert after.n_risky_rows == 0  # this spec fully anonymizes the fixture
