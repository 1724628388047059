"""Streaming DQ ledger: bit-exact stream ≡ batch report parity (SUM
monoid with keyed-overwrite deltas), compaction equivalence, restart
idempotency, and the grouped-check foundation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import expectations as dq
from peskas_mozambique_data_pipeline_spark.streaming import dq_ledger as dl
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
import pytest


def _rules():
    return [
        dq.expect("text_nonnull", F.col("text").isNotNull()),
        dq.expect("text_long", F.length("text") >= 12),
        dq.expect("id_positive", F.col("doc_id") > 0),
    ]


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _rows(lo, hi, source):
    # doc 0 violates id_positive; every 7th text NULL; every 5th short
    return [
        (
            i,
            None if i % 7 == 0 else ("x" if i % 5 == 0 else f"doc body {i}"),
            source,
        )
        for i in range(lo, hi)
    ]


def _run(spark, landing, zone, ck, schema, **kw):
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, dq_dir = dl.stream_dq_ledger(
        stream, zone, ck, _rules(), group_cols=["source"], **kw
    )
    q.awaitTermination(120)
    return dq_dir


def _want(spark, landing):
    return {
        (r.source, r.rule, r.n_violations, r.n_rows, r.frac)
        for r in dq.check(
            spark.read.parquet(landing), _rules(), ["source"]
        )
        .select("source", "rule", "n_violations", "n_rows", "frac")
        .collect()
    }


def _got(spark, zone):
    return {
        (r.source, r.rule, r.n_violations, r.n_rows, r.frac)
        for r in dl.read_dq_ledger(spark, zone, ["source"]).collect()
    }


def test_grouped_check_counts_match_python(spark):
    rows = _rows(0, 100, "a") + _rows(0, 50, "b")
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = {
        (r.source, r.rule): (r.n_violations, r.n_rows)
        for r in dq.check(df, _rules(), ["source"]).collect()
    }
    for src, n in (("a", 100), ("b", 50)):
        sub = [r for r in rows if r[2] == src]
        assert rep[(src, "text_nonnull")] == (
            sum(1 for r in sub if r[1] is None), n)
        assert rep[(src, "text_long")] == (
            sum(1 for r in sub if r[1] is None or len(r[1]) < 12), n)
        assert rep[(src, "id_positive")] == (
            sum(1 for r in sub if r[0] <= 0), n)


def test_stream_report_equals_batch_bit_for_bit(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, _rows(0, 300, "s1"))
    _write(spark, landing, _rows(300, 500, "s2"))
    _write(spark, landing, _rows(500, 800, "s1"))
    _run(spark, landing, zone, str(tmp_path / "ck"), schema)
    assert _got(spark, zone) == _want(spark, landing)


@pytest.mark.slow
def test_compaction_preserves_report_and_bounds_dirs(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, _rows(0, 100, "s1"))
    for lo in range(100, 600, 100):
        _write(spark, landing, _rows(lo, lo + 100, "s2" if lo % 200 else "s1"))
    _run(spark, landing, zone, str(tmp_path / "ck"), schema, compact_every=3)
    assert _got(spark, zone) == _want(spark, landing)
    # compaction actually bounded the delta dirs
    n_batch_dirs = len(
        [d for d in os.listdir(os.path.join(zone, dl.DQ_SUBDIR))
         if d.startswith("batch=")]
    )
    assert n_batch_dirs < 6


def test_restart_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 200, "s1"))
    _run(spark, landing, zone, ck, schema)
    first = _got(spark, zone)
    # restart with NO new data: same checkpoint, nothing double-counts
    _run(spark, landing, zone, ck, schema)
    assert _got(spark, zone) == first
    # land more, restart again: the fold advances exactly
    _write(spark, landing, _rows(200, 260, "s2"))
    _run(spark, landing, zone, ck, schema)
    assert _got(spark, zone) == _want(spark, landing)
