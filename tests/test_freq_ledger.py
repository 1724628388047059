"""Streaming CMS frequency ledger: bit-exact stream ≡ batch cell
parity (SUM monoid), compaction never double-counts, restart
idempotency, heavy-hitter surfacing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import sketches as sk
from peskas_mozambique_data_pipeline_spark.streaming import freq_ledger as fl
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
import pytest


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, url string, source string")
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _rows(lo, hi, source, hot_every=3):
    # every hot_every-th row hits the same hot url; others spread
    return [
        (
            i,
            "hot" if i % hot_every == 0 else f"url{i % 211}",
            source,
        )
        for i in range(lo, hi)
    ]


def test_stream_cells_equal_batch_bit_for_bit(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 300, "s1"))
    _write(spark, landing, _rows(200, 500, "s2"))
    _write(spark, landing, _rows(400, 800, "s1"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = fl.stream_freq_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"]
    )
    q.awaitTermination(120)

    got = {
        (r.source, r.i, r.cell): r.n
        for r in fl.read_cells(spark, zone, ["source"]).collect()
    }
    whole = spark.read.parquet(landing)
    want = {
        (r.source, r.i, r.cell): r.n
        for r in sk.cms_sketch(
            whole, "url", group_cols=["source"]
        ).collect()
    }
    assert got == want  # SUM monoid: stream ≡ batch, bit for bit

    # estimates never undercount the exact counts
    exact = {
        (r.source, r.url): r.x
        for r in whole.groupBy("source", "url")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    }
    probes = whole.select("source", "url").distinct()
    est = {
        (r.source, r.url): r.cms_count
        for r in fl.ledger_lookup(
            spark, zone, probes, "url", ["source"]
        ).collect()
    }
    assert all(est[k] >= x for k, x in exact.items())


@pytest.mark.slow
def test_compaction_never_double_counts_and_bounds_dirs(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 100, "s1"))
    for i in range(1, 6):
        _write(spark, landing, _rows(i * 100, i * 100 + 100, "s1"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, cells_dir = fl.stream_freq_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"],
        compact_every=3,
    )
    q.awaitTermination(120)

    # a snapshot exists and superseded batch dirs are gone
    compact_dir = os.path.join(zone, fl.CELLS_COMPACT_SUBDIR)
    assert os.path.isdir(compact_dir) and os.listdir(compact_dir)
    live = [d for d in os.listdir(cells_dir) if d.startswith("batch=")]
    assert len(live) < 6

    got = {
        (r.source, r.i, r.cell): r.n
        for r in fl.read_cells(spark, zone, ["source"]).collect()
    }
    whole = spark.read.parquet(landing)
    want = {
        (r.source, r.i, r.cell): r.n
        for r in sk.cms_sketch(whole, "url", group_cols=["source"]).collect()
    }
    assert got == want  # folded view == one-shot batch: no double count


def test_restart_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 200, "s1"))
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = fl.stream_freq_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"]
    )
    q.awaitTermination(120)
    before = {
        (r.source, r.i, r.cell): r.n
        for r in fl.read_cells(spark, zone, ["source"]).collect()
    }

    # restart over the same checkpoint: no new input -> nothing recounts
    stream2 = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q2, _ = fl.stream_freq_ledger(
        stream2, zone, ck, value_col="url", group_cols=["source"]
    )
    q2.awaitTermination(120)
    after = {
        (r.source, r.i, r.cell): r.n
        for r in fl.read_cells(spark, zone, ["source"]).collect()
    }
    assert before == after


def test_heavy_hitters_surface_the_hot_value(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 400, "s1"))
    _write(spark, landing, _rows(400, 800, "s1"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = fl.stream_freq_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"]
    )
    q.awaitTermination(120)

    hh = fl.heavy_hitters(spark, zone, "url", ["source"], top_k=5).collect()
    assert hh[0].url == "hot" if hh[0].source == "s1" else True
    top = {(r.source, r.url) for r in hh}
    assert ("s1", "hot") in top
    # ranked by estimate desc then value: the hot url leads its group
    s1 = [r for r in hh if r.source == "s1"]
    assert s1[0].url == "hot"
    assert len(s1) == 5


def test_ungrouped_ledger_and_heavy_hitters(spark, tmp_path):
    """Ungrouped path: per-batch candidates and final top-k flow
    through orderBy+limit (distributed TakeOrderedAndProject), and the
    ledger still equals the batch sketch cell-for-cell."""
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 300, "s1"))
    _write(spark, landing, _rows(300, 600, "s2"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = fl.stream_freq_ledger(stream, zone, ck, value_col="url")
    q.awaitTermination(120)

    got = {
        (r.i, r.cell): r.n for r in fl.read_cells(spark, zone).collect()
    }
    whole = spark.read.parquet(landing)
    want = {
        (r.i, r.cell): r.n for r in sk.cms_sketch(whole, "url").collect()
    }
    assert got == want
    hh = fl.heavy_hitters(spark, zone, "url", top_k=3).collect()
    assert hh[0].url == "hot" and len(hh) == 3
    plan = fl.heavy_hitters(spark, zone, "url", top_k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ledger_cells_replay_in_duckdb_from_raw_landing(spark, tmp_path):
    """Release-ledger-grade evidence: the folded cell table is
    reproducible by a foreign engine from the RAW landing parquet —
    the same md5 cell arithmetic, grouped counts (the zone state is
    engine-readable, not Spark-private)."""
    import duckdb

    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 250, "s1"))
    _write(spark, landing, _rows(250, 600, "s2"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = fl.stream_freq_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"]
    )
    q.awaitTermination(120)
    got = sorted(
        (r.source, r.i, r.cell, r.n)
        for r in fl.read_cells(spark, zone, ["source"]).collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            SELECT source, g.i,
                   ('0x' || substr(md5('cms' || g.i || '_' || url), 1, 2))::INT
                     AS cell,
                   COUNT(*) AS n
            FROM read_parquet('{landing}/*.parquet')
            CROSS JOIN (SELECT UNNEST(range(4)) AS i) g
            GROUP BY source, g.i, cell
            """
        ).fetchall()
    )
    assert got == [(s, int(i), int(c), int(n)) for s, i, c, n in want]
    assert len(got) > 100
