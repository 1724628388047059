"""MERGE / SCD2 operator semantics on crafted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators.merge import (
    merge_upsert,
    scd2_from_events,
)


def test_merge_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    source = spark.createDataFrame(
        [(2, "b2", 99), (4, "d", 40)], "k long, name string, v long"
    )
    out = {r.k: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2].name == "b2" and out[2].v == 99  # source wins on match
    assert out[1].v == 10 and out[3].v == 30  # untouched rows kept
    assert out[4].name == "d"  # insert


def test_merge_upsert_delta_may_omit_columns(spark):
    target = spark.createDataFrame([(1, "a", 10)], "k long, name string, v long")
    delta = spark.createDataFrame([(1, 99)], "k long, v long")
    row = merge_upsert(target, delta, ["k"]).first()
    assert row.v == 99 and row.name is None  # missing cols NULL-filled


def test_scd2_versions_collapse_and_close(spark):
    ev = spark.createDataFrame(
        [
            (1, "x", "2024-01-01", 1),
            (1, "x", "2024-02-01", 2),  # consecutive dup -> no new version
            (1, "y", "2024-03-01", 3),  # change -> closes x, opens y
            (1, "x", "2024-04-01", 4),  # change back -> third version
            (2, None, "2024-01-15", 5),  # NULL attr opens a version
            (2, None, "2024-02-15", 6),  # NULL==NULL (null-safe) -> collapse
            (2, "z", "2024-03-15", 7),
        ],
        "k long, attr string, d string, tk long",
    ).select("k", "attr", F.col("d").cast("date").alias("d"), "tk")
    out = scd2_from_events(ev, "k", "attr", "d", tiebreak="tk")
    rows = sorted(out.collect(), key=lambda r: (r.k, r.valid_from))
    k1 = [r for r in rows if r.k == 1]
    assert [r.attr for r in k1] == ["x", "y", "x"]
    assert str(k1[0].valid_to) == "2024-03-01"  # closed by the y version
    assert k1[2].valid_to is None and k1[2].is_current
    k2 = [r for r in rows if r.k == 2]
    assert [r.attr for r in k2] == [None, "z"]
    assert k2[0].valid_from.isoformat() == "2024-01-15"  # dup NULL collapsed


def test_scd2_same_day_tiebreak_deterministic(spark):
    ev = spark.createDataFrame(
        [(1, "a", "2024-01-01", 2), (1, "b", "2024-01-01", 1)],
        "k long, attr string, d string, tk long",
    ).select("k", "attr", F.col("d").cast("date").alias("d"), "tk")
    out = sorted(
        scd2_from_events(ev, "k", "attr", "d", tiebreak="tk").collect(),
        key=lambda r: not r.is_current,
    )
    # tk orders b before a: 'a' is the current version
    assert out[0].attr == "a" and out[0].is_current


def test_apply_cdc_latest_wins_python_twin(spark):
    from peskas_mozambique_data_pipeline_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    # interleaved history: k1 updated twice then deleted; k2 deleted
    # then re-inserted; k3 untouched; k4 inserted; k9 delete no-op
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "a1", 11),
            (1, 3, "upsert", "a2", 12),
            (1, 5, "delete", None, None),
            (2, 2, "delete", None, None),
            (2, 4, "upsert", "b2", 21),
            (4, 1, "upsert", "d", 40),
            (9, 7, "delete", None, None),
        ],
        "k long, seq long, op string, name string, v long",
    )
    got = sorted(
        tuple(r) for r in apply_cdc(target, changes, ["k"]).collect()
    )
    assert got == [(2, "b2", 21), (3, "c", 30), (4, "d", 40)]
    # partitioning invariance: same fixpoint on a reshuffled delta
    got2 = sorted(
        tuple(r)
        for r in apply_cdc(target, changes.repartition(7), ["k"]).collect()
    )
    assert got2 == got


def test_apply_cdc_guards_and_plan(spark):
    import contextlib
    import io

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from peskas_mozambique_data_pipeline_spark.operators.merge import apply_cdc

    target = spark.createDataFrame([(1, 10)], "k long, v long")
    dup = spark.createDataFrame(
        [(1, 1, "upsert", 11), (1, 1, "upsert", 12)],
        "k long, seq long, op string, v long",
    )
    with _pytest.raises(Exception) as ei:
        apply_cdc(target, dup, ["k"]).collect()
    assert "duplicate (key, seq)" in str(ei.value)
    badop = spark.createDataFrame(
        [(1, 1, "merge", 11)], "k long, seq long, op string, v long"
    )
    with _pytest.raises(Exception) as ei:
        apply_cdc(target, badop, ["k"]).collect()
    assert "unknown op" in str(ei.value)
    # strict=False skips the guard; the window is over the CHANGES side
    ok = spark.createDataFrame(
        [(1, 1, "upsert", 11)], "k long, seq long, op string, v long"
    )
    out = apply_cdc(target, ok, ["k"], strict=False)
    assert [tuple(r) for r in out.collect()] == [(1, 11)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    # the target is never windowed: the Window node ranks the CHANGES
    # frame only (it appears once per consumer of the latest-winner
    # subtree — the anti-join keys and the upsert rows — never over
    # the target scan)
    final = plan.split("Initial Plan")[0]
    assert 1 <= final.count("Window [") <= 2, final
