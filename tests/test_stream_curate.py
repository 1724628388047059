"""Streaming curation composition (streaming/curate.py): the
stream-safe DAG subset runs as ONE continuous query and admits exactly
the documents the batch operators admit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import (
    classifier as clf_ops,
    text as text_ops,
    web as web_ops,
)
from peskas_mozambique_data_pipeline_spark.streaming import curate as sc
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si

GOOD = (
    "This is a genuinely informative paragraph with plenty of distinct "
    "words and proper sentences that ends correctly. " * 3
)
CONTAM = "the secret benchmark passage hides right here in plain sight."


def _rows():
    return [
        # survives everything
        (1, "2024-01-01 00:00:01", "http://site.example/ok/1", GOOD + "alpha."),
        # robots-disallowed path
        (2, "2024-01-01 00:00:02", "http://site.example/private/x", GOOD + "beta."),
        # fails the quality gate (no terminal punctuation, tiny)
        (3, "2024-01-01 00:00:03", "http://site.example/ok/3", "tiny fragment"),
        # contaminated against the benchmark
        (4, "2024-01-01 00:00:04", "http://site.example/ok/4",
         GOOD + " " + CONTAM),
        # URL refetch of doc 1's page (tracking param): first-seen wins
        (5, "2024-01-01 00:00:05",
         "https://www.site.example/ok/1?utm_source=x", GOOD + "gamma."),
        # exact content duplicate of doc 1 at a new URL
        (6, "2024-01-01 00:00:06", "http://site.example/ok/6", GOOD + "alpha."),
        # independent survivor
        (7, "2024-01-01 00:00:07", "http://site.example/ok/7", GOOD + "delta."),
    ]


@pytest.fixture()
def parts(spark):
    docs = spark.createDataFrame(
        _rows(), "doc_id long, ts string, url string, text string"
    ).withColumn("ts", F.to_timestamp("ts"))
    robots = web_ops.parse_robots(
        spark.createDataFrame(
            [("site.example", "User-agent: *\nDisallow: /private/\n")],
            "host string, robots_txt string",
        )
    )
    benchmark = spark.createDataFrame([(99, CONTAM)], "doc_id long, text string")
    return docs, robots, benchmark


def test_stream_curate_matches_batch_gates(spark, parts, tmp_path):
    docs, robots, benchmark = parts
    src = str(tmp_path / "landing")
    docs.repartition(3).write.parquet(src)
    stream = si.stream_landing_zone(spark, src, spark.read.parquet(src).schema)

    curated = sc.stream_curate(
        stream,
        url_col="url",
        robots_rules=robots,
        benchmark=benchmark,
        decontam_n=5,
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = si.write_zone(curated, out_dir, ckpt)
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}

    # 2 robots, 3 quality, 4 contamination, and within-watermark dedup
    # kills one of {1,5} (URL refetch) and one of {1,6} (exact dup);
    # doc 7 survives.  With single-batch delivery order 1 wins both.
    assert 7 in got
    assert got & {2, 3, 4} == set()
    assert len(got & {1, 5}) == 1   # one canonical-URL representative
    assert len(got & {1, 6}) == 1   # one content representative

    # batch-operator parity on the stateless gates
    batch_robots = web_ops.filter_robots_disallowed(docs, robots, "url")
    assert 2 not in {r["doc_id"] for r in batch_robots.collect()}
    batch_quality = docs.filter(text_ops.c4_keep_expr("text"))
    assert 3 not in {r["doc_id"] for r in batch_quality.collect()}
    batch_contam = text_ops.ngram_contamination(docs, benchmark, n=5)
    assert {
        r["doc_id"] for r in batch_contam.filter("contaminated").collect()
    } == {4}


def test_stream_curate_classifier_gate(spark, parts, tmp_path):
    docs, _, _ = parts
    # a 2-feature model that votes on a marker token
    weights, bias = clf_ops.fit_hashed_nb(
        docs.sparkSession.createDataFrame(
            [(1, "alpha " * 6), (0, "delta " * 6)], "label int, text string"
        ),
        dim=256,
    )
    wmap = {int(r["feature"]): int(r["w_nano"]) for r in weights.collect()}
    src = str(tmp_path / "landing")
    docs.filter(F.col("doc_id").isin(1, 7)).write.parquet(src)
    stream = si.stream_landing_zone(spark, src, spark.read.parquet(src).schema)
    curated = sc.stream_curate(
        stream,
        classifier_weights=wmap,
        classifier_bias=bias,
        classifier_dim=256,
        content_dedup=False,
        quality=False,
    )
    out_dir, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    q = si.write_zone(curated, out_dir, ckpt)
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # doc 1 carries "alpha." (positive marker), doc 7 "delta." (negative)
    assert got == {1}

    # robots without url_col is rejected loudly
    with pytest.raises(ValueError):
        sc.stream_curate(stream, robots_rules=docs)


def test_stream_curated_zone_feeds_batch_dag_unchanged(spark, parts, tmp_path):
    """VERDICT r9 Next #6 round-trip: documents curated by the STREAM
    feed run_corpus_pipeline's batch-only stages unchanged — the batch
    quality gate admits every stream survivor (same expression), and
    the DAG runs through dedup/pack over the curated zone."""
    from peskas_mozambique_data_pipeline_spark.plans import corpus

    docs, robots, benchmark = parts
    src = str(tmp_path / "landing")
    docs.repartition(3).write.parquet(src)
    stream = si.stream_landing_zone(spark, src, spark.read.parquet(src).schema)
    curated_stream = sc.stream_curate(
        stream,
        url_col="url",
        robots_rules=robots,
        benchmark=benchmark,
        decontam_n=5,
    )
    out_dir, ckpt = str(tmp_path / "curated"), str(tmp_path / "ckpt")
    q = si.write_zone(curated_stream, out_dir, ckpt)
    q.awaitTermination(180)

    # documents-shaped frame for the batch DAG (the packing stage
    # strata-keys on lang; the landing fixture has no lang column)
    curated = spark.read.parquet(out_dir).select(
        "doc_id", "text", F.lit("en").alias("lang")
    )
    n_curated = curated.count()
    assert n_curated >= 2  # docs 7 plus a {1,5}/{1,6} representative

    zone_root = str(tmp_path / "zones")
    out = corpus.run_corpus_pipeline(
        spark, curated, zone_root, budget=64, jaccard_threshold=0.8
    )
    zones = corpus.PipelineZones(zone_root)
    # batch quality gate is a NO-OP on stream survivors: stream_curate
    # applied the identical c4_keep_expr already
    assert zones.read(spark, "corpus_filtered").count() == n_curated
    # the DAG ran through its core zones
    for z in ("corpus_filtered", "corpus_deduped", "corpus_packs"):
        assert z in out or zones.read(spark, z) is not None


def test_stream_curate_extract_html(spark, tmp_path):
    """extract_html runs first and stateless: markup docs stream
    through the quality gate as RENDERED text (the HTML wrapper would
    otherwise sink the symbol-ratio/length heuristics), and the
    curated text equals the batch extractor's output."""
    from peskas_mozambique_data_pipeline_spark.operators import html as html_ops

    page = (
        "<html><head><title>T</title><script>var x=1;</script></head>"
        "<body><p>" + GOOD + "epsilon.</p></body></html>"
    )
    docs = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", "http://site.example/ok/1", page)],
        "doc_id long, ts string, url string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "landing")
    docs.write.parquet(src)
    stream = si.stream_landing_zone(spark, src, spark.read.parquet(src).schema)

    curated = sc.stream_curate(stream, url_col="url", extract_html=True)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = si.write_zone(curated, out_dir, ckpt)
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1
    batch = html_ops.extract_html_text(docs).first()
    assert got[0]["text"] == batch["text"]
    assert "<p>" not in got[0]["text"] and "var x=1" not in got[0]["text"]
    assert got[0]["title"] == "T"
