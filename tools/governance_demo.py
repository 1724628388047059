"""Streaming-governance dashboard demo: ONE landing zone file-streamed
through all FIVE governance ledgers at once —

    distinct_ledger  (HLL, MAX semilattice)   → "how many distinct texts"
    freq_ledger      (CMS + candidates, SUM)  → "which sources/values dominate"
    quantile_ledger  (HDR buckets, SUM)       → "p50/p95/p99 of doc length"
    bloom_ledger     (packed filter, OR)      → "has this stream seen this text"
    dq_ledger        (rule counts, SUM)       → "all-time quality per source"

— then prints the standing governance tiles an ingest dashboard wants,
entirely from kilobyte-scale zone state, and cross-checks each tile
against the batch operator over the whole landing zone (the ledgers'
stream ≡ batch contracts, exercised side by side).

Usage: python tools/governance_demo.py [sf_dir]
       (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import sketches as sk
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table
from peskas_mozambique_data_pipeline_spark.streaming import distinct_ledger as dl
from peskas_mozambique_data_pipeline_spark.streaming import freq_ledger as fl
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
from peskas_mozambique_data_pipeline_spark.streaming import bloom_ledger as bll
from peskas_mozambique_data_pipeline_spark.streaming import dq_ledger as dql
from peskas_mozambique_data_pipeline_spark.streaming import quantile_ledger as ql
from peskas_mozambique_data_pipeline_spark.operators import expectations as dq


def _dq_rules():
    return [
        dq.expect("text_present", F.col("text").isNotNull()),
        dq.expect("text_substantial", F.col("n_chars") >= 50),
        dq.expect("lang_known", F.col("lang").isin("en", "de", "es", "fr")),
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="governance_demo_")
    landing = os.path.join(work, "landing")

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text", F.length("text").alias("n_chars")
    )
    # land in three files so each ledger sees three micro-batches
    docs.repartition(3).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    n_docs = docs.count()
    print(f"landing zone: {n_docs} docs in 3 files -> 3 micro-batches each\n")

    ledgers = {
        "distinct": lambda s: dl.stream_distinct_ledger(
            s, os.path.join(work, "z_distinct"), os.path.join(work, "ck_d"),
            value_col="text", group_cols=["source"],
        ),
        "freq": lambda s: fl.stream_freq_ledger(
            s, os.path.join(work, "z_freq"), os.path.join(work, "ck_f"),
            value_col="lang", group_cols=["source"],
        ),
        "quantile": lambda s: ql.stream_quantile_ledger(
            s, os.path.join(work, "z_quant"), os.path.join(work, "ck_q"),
            value_col="n_chars", group_cols=["source"],
        ),
        "membership": lambda s: bll.stream_bloom_ledger(
            s, os.path.join(work, "z_bloom"), os.path.join(work, "ck_b"),
            value_col="text", group_cols=["source"],
        ),
        "quality": lambda s: dql.stream_dq_ledger(
            s, os.path.join(work, "z_dq"), os.path.join(work, "ck_dq"),
            _dq_rules(), group_cols=["source"],
        ),
    }
    for name, start in ledgers.items():
        stream = si.stream_landing_zone(
            spark, landing, schema, max_files_per_trigger=1
        )
        q, _ = start(stream)
        q.awaitTermination(120)
        print(f"{name} ledger drained")

    whole = spark.read.parquet(landing)

    print("\n== tile 1: all-time distinct texts per source (HLL) ==")
    est = dl.ledger_estimate(spark, os.path.join(work, "z_distinct"), ["source"])
    batch = sk.hll_estimate(
        sk.hll_registers(whole, "text", ["source"]), ["source"]
    )
    got = {r.source: r.hll_distinct for r in est.collect()}
    want = {r.source: r.hll_distinct for r in batch.collect()}
    for src in sorted(got):
        mark = "==" if got[src] == want[src] else "!!"
        print(f"  {src:10s} stream={got[src]:10.1f} batch={want[src]:10.1f} {mark}")
    assert got == want

    print("\n== tile 2: dominant langs per source (CMS heavy hitters) ==")
    hh = fl.heavy_hitters(
        spark, os.path.join(work, "z_freq"), "lang", ["source"], top_k=3
    )
    exact = {
        (r.source, r.lang): r.n
        for r in whole.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in hh.collect():
        true_n = exact.get((r.source, r.lang), 0)
        assert r.cms_count >= true_n  # one-sided error
        print(f"  {r.source:10s} {r.lang:4s} est={r.cms_count:6d} exact={true_n:6d}")

    print("\n== tile 3: doc-length percentiles per source (HDR) ==")
    qs = ql.ledger_quantiles(
        spark, os.path.join(work, "z_quant"), [0.5, 0.95, 0.99], ["source"]
    )
    for r in sorted(qs.collect(), key=lambda r: (r.source, r.quantile)):
        print(f"  {r.source:10s} p{int(r.quantile * 100):<3d} ~{r.estimate} chars")
    batch_q = sk.hdr_quantiles(
        sk.hdr_histogram(whole, "n_chars", ["source"]),
        [0.5, 0.95, 0.99],
        ["source"],
    )
    sq = {(r.source, r.quantile): r.estimate for r in qs.collect()}
    bq = {(r.source, r.quantile): r.estimate for r in batch_q.collect()}
    assert sq == bq  # stream ≡ batch, tile for tile

    print("\n== tile 4: all-time membership (Bloom) ==")
    probes = whole.select("source", "text").distinct()
    seen = bll.ledger_probe(
        spark, os.path.join(work, "z_bloom"), probes, "text", ["source"]
    )
    n_probe = seen.count()
    n_seen = seen.filter("maybe_seen").count()
    assert n_seen == n_probe  # no false negatives, ever
    occ = bll.ledger_occupancy(
        spark, os.path.join(work, "z_bloom"), ["source"]
    ).collect()
    worst = max(occ, key=lambda r: r.bloom_fpp)
    print(f"  {n_seen}/{n_probe} carried texts probe seen; worst fpp "
          f"{worst.bloom_fpp:.4f} ({worst.source}, "
          f"{worst.bloom_bits_set} bits)")

    print("\n== tile 5: all-time quality per source (DQ rule counts) ==")
    rep = dql.read_dq_ledger(spark, os.path.join(work, "z_dq"), ["source"])
    got_dq = {
        (r.source, r.rule): (r.n_violations, r.n_rows, r.frac)
        for r in rep.collect()
    }
    want_dq = {
        (r.source, r.rule): (r.n_violations, r.n_rows, r.frac)
        for r in dq.check(whole, _dq_rules(), ["source"]).collect()
    }
    assert got_dq == want_dq  # stream ≡ batch, tile for tile
    worst_dq = max(got_dq.items(), key=lambda kv: kv[1][2])
    (wsrc, wrule), (wv, wn, wfrac) = worst_dq
    print(f"  worst: {wrule} in {wsrc}: {wv}/{wn} ({wfrac})")

    print("\n== tile 6: live corpus rollup under churn (IVM) ==")
    # a CDC view of the same corpus: every doc upserts, every 5th doc
    # is later deleted — the rollup zone folds retract/apply deltas so
    # the per-source LIVE count/volume tile never rescans state
    from peskas_mozambique_data_pipeline_spark.streaming import (
        cdc_zone as cz,
        rollup_zone as rz,
    )

    ch_landing = os.path.join(work, "ch_landing")
    ups = docs.select(
        F.col("doc_id").alias("k"),
        (F.col("doc_id") * 2).alias("seq"),
        F.lit("upsert").alias("op"),
        F.col("source").alias("grp"),
        F.col("n_chars").cast("long").alias("cents"),
    )
    dels = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("k"),
        (F.col("doc_id") * 2 + 1).alias("seq"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("grp"),
        F.lit(None).cast("long").alias("cents"),
    )
    ups.repartition(2).write.parquet(ch_landing)
    dels.coalesce(1).write.mode("append").parquet(ch_landing)
    ch_schema = spark.read.parquet(ch_landing).schema
    stream = si.stream_landing_zone(
        spark, ch_landing, ch_schema, max_files_per_trigger=1
    )
    # compact_every=None: the three landing files carry overlapping
    # seq ranges (repartition order), and compaction's monotonic-seq
    # guard rightly rejects folding such a feed — the demo shows the
    # delta fold; the compaction path is pytest-covered with a
    # monotonic feed (tests/test_rollup_zone.py)
    q, zdir = rz.stream_rollup_zone(
        stream, os.path.join(work, "z_roll"), os.path.join(work, "ck_r"),
        ["k"], ["grp"], ["cents"], compact_every=None,
    )
    q.awaitTermination(120)
    roll = {
        r.grp: (r.n_rows, r.sum_cents)
        for r in rz.read_rollup(
            spark, zdir, ["grp"], ["cents"]
        ).collect()
    }
    state = cz.read_cdc_state(spark, zdir, ["k"], strict=False)
    want_roll = {
        r.grp: (r.n, r.s)
        for r in state.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).collect()
    }
    assert roll == want_roll  # incremental fold ≡ groupBy over state
    for src in sorted(roll):
        n, s = roll[src]
        print(f"  {src:10s} live docs {n:6d}  chars {s}")
    n_live = sum(n for n, _ in roll.values())
    assert n_live == docs.filter(F.col("doc_id") % 5 != 0).count()

    print("\ngovernance demo: all six ledgers agree with batch — OK")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
