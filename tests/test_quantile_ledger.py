"""Streaming HDR quantile ledger: bit-exact stream ≡ batch bucket
parity (SUM monoid), compaction, restart idempotency, quantile
estimates from the folded state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import sketches as sk
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
from peskas_mozambique_data_pipeline_spark.streaming import (
    quantile_ledger as ql,
)


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, size long, source string")
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _rows(lo, hi, source):
    return [(i, (i * 97) % 50000 + 1, source) for i in range(lo, hi)]


def test_stream_buckets_equal_batch_and_quantiles_bound(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 400, "s1"))
    _write(spark, landing, _rows(400, 900, "s2"))
    _write(spark, landing, _rows(900, 1500, "s1"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = ql.stream_quantile_ledger(
        stream, zone, ck, value_col="size", group_cols=["source"],
        compact_every=2,
    )
    q.awaitTermination(120)

    got = {
        (r.source, r.bucket, r.lo): r.n
        for r in ql.read_histogram(spark, zone, ["source"]).collect()
    }
    whole = spark.read.parquet(landing)
    want = {
        (r.source, r.bucket, r.lo): r.n
        for r in sk.hdr_histogram(whole, "size", ["source"]).collect()
    }
    assert got == want  # SUM monoid through compaction, bit for bit

    est = {
        (r.source, r.quantile): r.estimate
        for r in ql.ledger_quantiles(
            spark, zone, [0.5, 0.99], ["source"]
        ).collect()
    }
    exact = {}
    for src in ("s1", "s2"):
        vals = sorted(
            r.size for r in whole.filter(F.col("source") == src).collect()
        )
        for qq in (0.5, 0.99):
            exact[(src, qq)] = vals[
                max(0, -(-int(qq * len(vals))) - 1)
            ]
    for key, e in est.items():
        x = exact[key]
        assert e <= x <= e * (1 + 2 ** -sk.HDR_SUB_BITS) + 1, (key, e, x)


def test_restart_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 300, "s1"))
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = ql.stream_quantile_ledger(
        stream, zone, ck, value_col="size", group_cols=["source"]
    )
    q.awaitTermination(120)
    before = {
        (r.source, r.bucket): r.n
        for r in ql.read_histogram(spark, zone, ["source"]).collect()
    }
    stream2 = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q2, _ = ql.stream_quantile_ledger(
        stream2, zone, ck, value_col="size", group_cols=["source"]
    )
    q2.awaitTermination(120)
    after = {
        (r.source, r.bucket): r.n
        for r in ql.read_histogram(spark, zone, ["source"]).collect()
    }
    assert before == after
