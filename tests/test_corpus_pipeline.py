from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.plans import corpus


def _mk_doc(seed_words: list[str]) -> str:
    # 26 tokens, natural stopword density, passes the C4 gate
    base = "the quick brown fox jumps over a lazy dog and then runs to in of"
    return base + " " + " ".join(seed_words) + " again and again today is fine"


def _corpus(spark):
    doc = _mk_doc(["alpha", "beta", "gamma", "delta"])
    near = doc.replace("today", "tomorrow")  # near-dup of doc
    other = _mk_doc(["omega", "sigma", "theta", "kappa"])
    rows = [
        (1, doc, "en"),
        (2, near, "en"),          # near-dup: cluster {1,2}, keep 1
        (3, doc, "en"),           # exact dup: joins cluster {1,2,3}
        (4, other, "en"),         # unique survivor
        (5, "too short", "en"),   # fails quality gate
        (6, "!!! ??? " * 20, "en"),  # punctuation soup, fails gate
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_corpus_pipeline_zone_dag(spark, tmp_path):
    docs = _corpus(spark)
    # one changed token among 26 gives Jaccard ~0.63 between docs 1 and
    # 2 — threshold 0.5 makes {1,2,3} one cluster (3 is an exact dup)
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=30, jaccard_threshold=0.5
    )
    filtered = spark.read.parquet(out["corpus_filtered"])
    deduped = spark.read.parquet(out["corpus_deduped"])
    packs = spark.read.parquet(out["corpus_packs"])

    # quality gate dropped the short + punctuation docs
    assert set(r.doc_id for r in filtered.collect()) == {1, 2, 3, 4}
    # near-dup cluster {1,2,3} collapsed to its minimum-id representative
    assert set(r.doc_id for r in deduped.collect()) == {1, 4}
    # packs partition the survivors exactly
    assert packs.agg(F.sum("n_docs")).first()[0] == 2
    # 26-token docs with budget 30: doc 1 -> pack 0, doc 4 -> pack 0(26//30=0)...
    # tokens-before for doc 4 is 26 -> pack 0; both in pack 0
    assert packs.count() == 1


def test_corpus_pipeline_skip_fresh_reuses_versions(spark, tmp_path):
    docs = _corpus(spark)
    root = str(tmp_path / "zones")
    first = corpus.run_corpus_pipeline(spark, docs, root)
    again = corpus.run_corpus_pipeline(spark, docs, root, skip_fresh=True)
    # every stage skipped: identical version paths, no recompute
    assert again == first


def test_dedup_survivors_keeps_singletons(spark):
    docs = _corpus(spark).filter(F.col("doc_id").isin(1, 4))
    out = corpus.dedup_survivors(docs)
    assert set(r.doc_id for r in out.collect()) == {1, 4}


def test_streaming_document_dedup_at_ingest(spark, tmp_path):
    """The streaming face of corpus curation: documents landing
    incrementally are exact-deduped AT INGEST by content digest within
    the watermark horizon — state stays bounded, and the curated zone
    never sees the duplicate."""
    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.streaming import ingest as si

    landing = str(tmp_path / "doc_landing")
    rows = [
        (1, "the quick brown fox", "2024-01-01 00:10:00"),
        (2, "a different document", "2024-01-01 00:20:00"),
        (3, "The quick  brown fox", "2024-01-01 00:30:00"),  # dup after norm
        (4, "yet another text", "2024-01-01 00:40:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.parquet(landing)

    stream = si.stream_landing_zone(spark, landing, df.schema)
    digest = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    deduped = si.streaming_dedup(
        stream.withColumn("digest", digest), ["digest"], watermark="1 hour"
    )
    q, path = si.stream_to_versioned_zone(
        deduped, str(tmp_path / "zone"), "docs", str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(path)
    assert out.count() == 3  # doc 3 (normalized dup of 1) dropped
    assert set(r.doc_id for r in out.collect()) == {1, 2, 4}


def _embeddings(spark, vecs: dict[int, list[float]]):
    rows = [(i, "b0", [float(x) for x in v]) for i, v in vecs.items()]
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_semantic_dedup_stage_arrow_backend(spark, tmp_path):
    docs = _corpus(spark)
    # doc 4 is textually unique but SEMANTICALLY a duplicate of doc 1:
    # same direction vector → cosine 1.0; doc 1 (min id) is kept
    emb = _embeddings(
        spark,
        {
            1: [1.0, 0.0, 0.0],
            2: [0.0, 1.0, 0.0],
            3: [0.0, 0.0, 1.0],
            4: [2.0, 0.0, 0.0],
        },
    )
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=30,
        jaccard_threshold=0.5,
        embeddings=emb,
        semantic_threshold=0.9,
        semantic_backend="arrow",
    )
    semantic = spark.read.parquet(out["corpus_semantic"])
    assert set(r.doc_id for r in semantic.collect()) == {1}
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] == 1


def test_semantic_survivors_backend_parity(spark):
    docs = _corpus(spark)
    emb = _embeddings(
        spark,
        {
            1: [1.0, 0.1, 0.0],
            2: [1.0, 0.11, 0.0],   # near-dup of 1
            3: [0.0, 1.0, 0.2],
            4: [0.0, 1.0, 0.21],   # near-dup of 3
        },
    )
    arrow = set(
        r.doc_id
        for r in corpus.semantic_survivors(docs, emb, 0.99, backend="arrow").collect()
    )
    jvm = set(
        r.doc_id
        for r in corpus.semantic_survivors(docs, emb, 0.99, backend="jvm").collect()
    )
    # same survivor set regardless of backend; clusters {1,2} and {3,4}
    # keep their minimum ids and the gate-failing docs 5/6 pass through
    # (semantic dedup drops only cluster losers, quality is upstream)
    assert arrow == jvm == {1, 3, 5, 6}


def test_streaming_quality_gate_feeds_dedup_index(spark, tmp_path):
    """Streaming curation composes: the C4 keep predicate is a
    stateless filter ON the stream, so only gate-surviving documents
    ever reach the incremental near-dup index (one query, no
    intermediate landing)."""
    from peskas_mozambique_data_pipeline_spark.operators import text as text_ops
    from peskas_mozambique_data_pipeline_spark.streaming import dedup_index as di
    from peskas_mozambique_data_pipeline_spark.streaming import ingest as si

    doc = _mk_doc(["alpha", "beta", "gamma", "delta"])
    rows = [
        (1, doc, "en"),
        (2, doc.replace("today", "tomorrow"), "en"),  # near-dup of 1
        (3, "too short", "en"),                        # gate drops
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    landing = str(tmp_path / "landing")
    df.coalesce(1).write.parquet(landing)

    stream = si.stream_landing_zone(spark, landing, df.schema)
    gated = stream.filter(text_ops.c4_keep_expr("text"))
    q, index_dir, pairs_dir = di.stream_near_dup_index(
        gated, str(tmp_path / "zone"), str(tmp_path / "ck"),
        jaccard_threshold=0.5,
    )
    q.awaitTermination(120)

    idx_docs = {
        r.doc_id
        for r in di.read_index(
            spark, index_dir, str(tmp_path / "zone" / di.COMPACT_SUBDIR)
        ).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 2}  # doc 3 never entered the index
    pairs = {(r.id_a, r.id_b) for r in di.read_pairs(spark, pairs_dir).collect()}
    assert pairs == {(1, 2)}


def test_corpus_pipeline_with_span_scrub(spark, tmp_path):
    """Doc-level dedup keeps doc 4 (textually unique), but docs 1 and 4
    share the _mk_doc boilerplate prefix — span scrub cuts that shared
    run inside BOTH survivors before packing."""
    docs = _corpus(spark)
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=30,
        jaccard_threshold=0.5,
        scrub_spans=True,
        span_n=8,
    )
    scrubbed = {
        r.doc_id: (r.text, r.n_removed)
        for r in spark.read.parquet(out["corpus_scrubbed"]).collect()
    }
    assert set(scrubbed) == {1, 4}
    # the shared 15-token prefix ("the quick brown fox ... to in of")
    # is duplicated between docs 1 and 4 → removed from both
    for d in (1, 4):
        text, n_removed = scrubbed[d]
        assert n_removed > 0
        assert "quick brown fox" not in text
    # the unique seed words survive
    assert "alpha" in scrubbed[1][0] and "omega" in scrubbed[4][0]
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] == 2


def test_corpus_zone_files_have_disjoint_id_ranges(spark, tmp_path):
    """Doc-keyed corpus zones are written range-partitioned on doc_id:
    file-level key ranges must be disjoint so downstream id predicates
    prune whole files (VERDICT r5 #5: layouts wired into the zones)."""
    rows = [(i, _mk_doc([f"w{i}", f"x{i}", f"y{i}", f"z{i}"]), "en")
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    # AQE would coalesce this toy corpus into ONE file (correct at
    # scale — partitions pack to the advisory size); disable the
    # coalescing so the range layout is observable across several files
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        out = corpus.run_corpus_pipeline(
            spark, docs, str(tmp_path / "zones"), budget=30,
            jaccard_threshold=0.9,
        )
    finally:
        spark.conf.set(key, prev)
    for zone in ("corpus_filtered", "corpus_deduped"):
        back = spark.read.parquet(out[zone]).select(
            "doc_id", F.input_file_name().alias("f")
        )
        ranges = back.groupBy("f").agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()
        assert len(ranges) >= 2, zone  # actually split across files
        spans = sorted((r.lo, r.hi) for r in ranges)
        for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
            assert hi1 <= lo2, zone


def test_bucketed_zone_join_has_no_exchange(spark, tmp_path):
    """write_bucketed/read_bucketed on the zone: two curated tables
    bucketed on doc_id join with zero Exchange in the plan."""
    import contextlib
    import io as _io

    from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones

    zones = PipelineZones(str(tmp_path / "zones"))
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    meta = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("shard")
    )
    zones.write_bucketed(docs, "docs_b", ["doc_id"], n_buckets=4)
    zones.write_bucketed(meta, "meta_b", ["doc_id"], n_buckets=4)
    joined = zones.read_bucketed(spark, "docs_b").hint("merge").join(
        zones.read_bucketed(spark, "meta_b").hint("merge"), "doc_id"
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert joined.count() == 2000
    # the zone dir still resolves through the normal versioned reader
    assert zones.read(spark, "docs_b").count() == 2000


@pytest.mark.slow
def test_corpus_pipeline_with_decontamination_and_shuffle(spark, tmp_path):
    """The full curation DAG with the two new optional stages: the
    benchmark-contaminated doc is removed BEFORE dedup (so its
    near-dup partner survives as its own cluster), and the packed
    corpus gets a dense deterministic training-order permutation."""
    docs = _corpus(spark)
    # benchmark shares a 5-gram with doc 4 ("omega sigma theta kappa"
    # run); docs 1-3 are unrelated to it
    bench = spark.createDataFrame(
        [(100, "fox omega sigma theta kappa again words")],
        ["doc_id", "text"],
    )
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=30,
        jaccard_threshold=0.5, benchmark=bench, decontam_n=5,
        shuffle_salt="epoch0",
    )
    decon = spark.read.parquet(out["corpus_decontaminated"])
    assert set(r.doc_id for r in decon.collect()) == {1, 2, 3}  # doc 4 cut
    deduped = spark.read.parquet(out["corpus_deduped"])
    assert set(r.doc_id for r in deduped.collect()) == {1}
    shuffled = spark.read.parquet(out["corpus_shuffled"])
    rows = shuffled.collect()
    # dense permutation 0..n-1 over the packs
    assert sorted(r.shuffle_pos for r in rows) == list(range(len(rows)))
    # epoch salt changes the permutation deterministically: same salt →
    # identical positions on a re-run
    out2 = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones2"), budget=30,
        jaccard_threshold=0.5, benchmark=bench, decontam_n=5,
        shuffle_salt="epoch0",
    )
    shuffled2 = spark.read.parquet(out2["corpus_shuffled"])
    key = lambda rws: sorted((r.lang, r.pack_id, r.shuffle_pos) for r in rws)
    assert key(rows) == key(shuffled2.collect())


def test_zone_vacuum_via_pipeline_zones(spark, tmp_path):
    """PipelineZones.vacuum (r8): the maintenance pair completes —
    compact bounds files, vacuum bounds versions; read() keeps working
    through both."""
    import os
    import time

    from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones

    zones = PipelineZones(str(tmp_path / "zones"), git_sha="g1")
    os.makedirs(zones.root, exist_ok=True)
    df = spark.range(0, 500).withColumn("v", F.col("id") * 3)
    p1 = zones.write(df.repartition(8), "corpus_packs")
    time.sleep(1.1)
    p2 = zones.compact(spark, "corpus_packs", target_mb=64)
    time.sleep(1.1)
    p3 = zones.compact(spark, "corpus_packs", target_mb=256)
    assert zones.read(spark, "corpus_packs").count() == 500

    removed = zones.vacuum(spark, "corpus_packs", keep_last=1)
    assert removed == [p1, p2]
    assert not os.path.exists(p1) and not os.path.exists(p2)
    assert os.path.exists(p3)
    assert zones.read(spark, "corpus_packs").count() == 500
    # freshness logic still sees the surviving version
    assert zones.is_fresh("corpus_packs")


def test_corpus_pipeline_line_scrub_stage(spark, tmp_path):
    """scrub_lines=True (r8): the line-grain boilerplate cut runs
    between quality and dedup, downstream stages read the scrubbed
    zone, and the shared chrome line is gone from every survivor."""
    chrome = "subscribe to our mailing list for weekly updates"
    rows = [
        (1, _mk_doc(["alpha", "beta", "gamma", "delta"]) + "\n" + chrome, "en"),
        (4, _mk_doc(["omega", "sigma", "theta", "kappa"]) + "\n" + chrome, "en"),
        (7, _mk_doc(["eins", "zwei", "drei", "vier"]) + "\n" + chrome, "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=40,
        jaccard_threshold=0.5, scrub_lines=True, line_min_docs=3,
    )
    assert "corpus_line_scrubbed" in out
    scrubbed = spark.read.parquet(out["corpus_line_scrubbed"])
    texts = {r.doc_id: r.text for r in scrubbed.collect()}
    assert set(texts) == {1, 4, 7}
    assert all(chrome not in t for t in texts.values())
    assert all(r.n_scrubbed == 1 for r in scrubbed.collect())
    # dedup consumed the scrubbed zone (bodies unique -> all survive)
    deduped = spark.read.parquet(out["corpus_deduped"])
    assert set(r.doc_id for r in deduped.collect()) == {1, 4, 7}
    assert all(chrome not in r.text for r in deduped.collect())


def test_corpus_pipeline_front_door_normalize_and_url_dedup(spark, tmp_path):
    import pytest

    doc = _mk_doc(["alpha", "beta", "gamma", "delta"])
    other = _mk_doc(["omega", "sigma", "theta", "kappa"])
    rows = [
        # doc 1 and 2: same content modulo CRLF/tab formatting AND the
        # same page refetched over http/https with tracking params ->
        # the URL stage collapses them before any content pass
        (1, doc, "en", "https://www.site.com/page?utm_source=a"),
        (2, doc.replace(" ", "\t", 3) + "\r\n", "en", "http://site.com/page/"),
        (3, other, "en", "https://site.com/other"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "url"])
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=40,
        jaccard_threshold=0.5,
        normalize=True,
        url_col="url",
    )
    normalized = spark.read.parquet(out["corpus_normalized"])
    url_deduped = spark.read.parquet(out["corpus_url_deduped"])
    deduped = spark.read.parquet(out["corpus_deduped"])

    # normalization made docs 1 and 2 byte-identical
    texts = {r.doc_id: r.text for r in normalized.collect()}
    assert texts[1] == texts[2]
    # URL stage kept the smallest id per canonical URL
    assert {r.doc_id for r in url_deduped.collect()} == {1, 3}
    # bookkeeping columns do not leak into the zone
    assert set(url_deduped.columns) == {"doc_id", "text", "lang", "url"}
    assert {r.doc_id for r in deduped.collect()} == {1, 3}

    # url_col without the normalize stage is a wiring error
    with pytest.raises(ValueError):
        corpus.run_corpus_pipeline(
            spark, docs, str(tmp_path / "z2"), url_col="url"
        )


def test_corpus_pipeline_normalize_skip_fresh(spark, tmp_path):
    doc = _mk_doc(["alpha", "beta", "gamma", "delta"])
    docs = spark.createDataFrame([(1, doc, "en")], ["doc_id", "text", "lang"])
    root = str(tmp_path / "zones")
    first = corpus.run_corpus_pipeline(
        spark, docs, root, budget=40, normalize=True
    )
    second = corpus.run_corpus_pipeline(
        spark, docs, root, budget=40, normalize=True, skip_fresh=True
    )
    # fresh zones are reused, not rewritten
    assert second["corpus_normalized"] == first["corpus_normalized"]
    assert second["corpus_filtered"] == first["corpus_filtered"]


def test_corpus_pipeline_classifier_gate(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.operators import classifier

    good = _mk_doc(["alpha", "beta", "gamma", "delta"])
    bad = _mk_doc(["casino", "casino", "jackpot", "winnings"])
    seed = spark.createDataFrame(
        [
            (100, "casino jackpot winnings casino bonus spins", 0),
            (101, "casino winnings jackpot deal", 0),
            (102, "alpha beta gamma delta report analysis", 1),
            (103, "delta gamma figures alpha beta summary", 1),
        ],
        ["doc_id", "text", "label"],
    )
    weights, bias = classifier.fit_hashed_nb(seed, dim=256)
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, bad, "en")], ["doc_id", "text", "lang"]
    )
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=40,
        classifier_weights=weights,
        classifier_bias=bias,
        classifier_threshold=0.0,
        classifier_dim=256,
    )
    classified = spark.read.parquet(out["corpus_classified"])
    # the casino doc scores below the good doc and falls under the gate
    assert {r.doc_id for r in classified.collect()} == {1}
    # score/prob bookkeeping does not leak into the zone
    assert set(classified.columns) == {"doc_id", "text", "lang"}
    deduped = spark.read.parquet(out["corpus_deduped"])
    assert {r.doc_id for r in deduped.collect()} == {1}


def test_quality_gate_goes_stale_when_normalized_zone_refreshes(
    spark, tmp_path
):
    import time

    doc = _mk_doc(["alpha", "beta", "gamma", "delta"])
    docs = spark.createDataFrame([(1, doc, "en")], ["doc_id", "text", "lang"])
    root = str(tmp_path / "zones")
    first = corpus.run_corpus_pipeline(
        spark, docs, root, budget=40, normalize=True
    )
    # a new normalized version lands (e.g. upstream refetch); the
    # filtered zone derives from it and must be rebuilt, not reused
    time.sleep(1.1)  # version timestamps are second-granularity
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    zones = PipelineZones(root, "local")
    zones.write(docs, "corpus_normalized", range_by=["doc_id"])
    second = corpus.run_corpus_pipeline(
        spark, docs, root, budget=40, normalize=True, skip_fresh=True
    )
    assert second["corpus_normalized"] != first["corpus_normalized"]
    assert second["corpus_filtered"] != first["corpus_filtered"]


def test_corpus_pipeline_training_shards_stage(spark, tmp_path):
    """shard_tokens cuts the shuffled corpus into contiguous
    token-budget shards written hive-partitioned on shard_id."""
    import os

    docs = _corpus(spark)
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=10,
        jaccard_threshold=0.5, shuffle_salt="epoch0", shard_tokens=25,
    )
    assert "training_shards" in out
    sharded = spark.read.parquet(out["training_shards"])
    rows = sorted(sharded.collect(), key=lambda r: r.shuffle_pos)
    # cum-before / budget, computed against the written pack token counts
    cum = 0
    for r in rows:
        assert r.shard_id == cum // 25
        cum += r.pack_tokens
    # hive layout: one shard_id=N directory per shard
    dirs = {
        d for d in os.listdir(out["training_shards"]) if d.startswith("shard_id=")
    }
    assert dirs == {f"shard_id={r.shard_id}" for r in rows}
    # manifest sidecar: loader-facing shard plan, totals consistent
    import json

    with open(os.path.join(out["training_shards"], "_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["n_shards"] == len(dirs)
    assert manifest["total_tokens"] == sum(r.pack_tokens for r in rows)
    assert {s["path"] for s in manifest["shards"]} == dirs
    for s in manifest["shards"]:
        assert s["first_pos"] <= s["last_pos"]


def test_corpus_pipeline_fim_stage(spark, tmp_path):
    """fim_rate inserts the augmentation stage before packing: the
    augmented zone carries FIM-rewritten text for selected docs and
    downstream packs consume it."""
    from peskas_mozambique_data_pipeline_spark.operators import augment

    docs = _corpus(spark)
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=50,
        jaccard_threshold=0.5, fim_rate=1.0,
    )
    assert "corpus_augmented" in out
    aug = spark.read.parquet(out["corpus_augmented"]).collect()
    assert all(r.fim_applied for r in aug)  # 26-token docs, rate 1.0
    assert all(r.text.startswith(augment.FIM_PRE) for r in aug)
    # packs read the augmented zone (doc count carried through)
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] == len(aug)


def test_warc_front_door_end_to_end(spark, tmp_path):
    """VERDICT r8 Next #5: crawl bytes enter the SAME curation DAG —
    WARC ingest → normalize → URL refetch dedup → quality → dedup →
    pack, end to end from a synthetic member-gzip archive with a
    malformed stretch (skip mode) and an http/https refetch pair."""
    import gzip

    from tests.test_warc import _http, _record

    body_a = ("alpha document with plenty of genuine words to pass the "
              "quality gate. " * 8).encode()
    body_b = ("bravo document entirely different content and also long "
              "enough to pass the gate. " * 8).encode()
    recs = [
        _record("warcinfo", b"software: test\r\n"),
        _record(
            "response", _http(body_a),
            **{"WARC-Target-URI": "http://site.example/page?utm_source=x"},
        ),
        # refetch of the SAME canonical URL, different bytes — the URL
        # front door must collapse it (winner = smaller content doc id)
        _record(
            "response", _http(body_a + b" trailing refetch delta"),
            **{"WARC-Target-URI": "https://www.site.example/page"},
        ),
        _record(
            "response", _http(body_b),
            **{"WARC-Target-URI": "https://other.example/b"},
        ),
    ]
    blob = recs[0] + b"CORRUPT\r\nstretch\r\n" + b"".join(recs[1:])
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(b"".join(gzip.compress(m) for m in [blob]))

    out = corpus.run_corpus_pipeline(
        spark,
        None,
        str(tmp_path / "zones"),
        budget=10_000,
        jaccard_threshold=0.5,
        normalize=True,
        url_col="url",
        warc_path=str(p),
    )
    assert "corpus_ingested" in out and "corpus_url_deduped" in out
    ingested = spark.read.parquet(out["corpus_ingested"])
    assert ingested.count() == 3  # 3 text/200 responses survive ingest
    url_deduped = spark.read.parquet(out["corpus_url_deduped"])
    assert url_deduped.count() == 2  # refetch collapsed on canonical URL
    urls = {r["url"] for r in url_deduped.collect()}
    assert len(urls) == 2
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] >= 1

    # docs XOR warc_path is enforced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.run_corpus_pipeline(
            spark, ingested, str(tmp_path / "z2"), warc_path=str(p)
        )
    with _pytest.raises(ValueError):
        corpus.run_corpus_pipeline(spark, None, str(tmp_path / "z3"))


def test_stage_lang_segment_in_dag(spark, tmp_path):
    en = ("a genuinely informative english sentence with plenty of the "
          "words and all of this ends here. ")
    de = "der und die das ist nicht ein mit sich auch dabei."
    docs = spark.createDataFrame(
        [
            (1, en * 4 + "\n" + de, "en"),
            (2, en * 4 + "unique two.", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=10_000,
        jaccard_threshold=0.99,
        segment_langs=True,
    )
    seg = spark.read.parquet(out["corpus_lang_segmented"])
    rows = {r["doc_id"]: r for r in seg.collect()}
    assert rows[1]["lang"] == "en"
    assert de not in rows[1]["text"]          # minority line scrubbed
    assert rows[1]["lang_line_share"] < 1.0
    assert rows[2]["lang"] == "en" and rows[2]["lang_line_share"] == 1.0
    # downstream stages consumed the segmented zone
    assert "corpus_deduped" in out


def test_stage_extract_html_in_dag(spark, tmp_path):
    """extract_html reduces ingested HTML payloads to rendered text
    before any text stage: the extracted zone carries clean text +
    title, n_chars measures the CLEAN text, and the quality gate /
    packs consume the extracted corpus."""
    import gzip

    from tests.test_warc import _http, _record

    sentence = (
        "this paragraph has plenty of genuinely informative words and "
        "it keeps going long enough to pass every heuristic gate. "
    )
    page = (
        "<html><head><title>Alpha &amp; Co</title>"
        "<script>var tracking = 'not text';</script></head>"
        "<body><p>" + sentence * 8 + "</p></body></html>"
    ).encode()
    recs = [
        _record("warcinfo", b"software: test\r\n"),
        _record(
            "response", _http(page),
            **{"WARC-Target-URI": "https://site.example/alpha"},
        ),
    ]
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(gzip.compress(b"".join(recs)))

    out = corpus.run_corpus_pipeline(
        spark,
        None,
        str(tmp_path / "zones"),
        budget=10_000,
        jaccard_threshold=0.5,
        warc_path=str(p),
        extract_html=True,
    )
    assert "corpus_extracted" in out
    ext = spark.read.parquet(out["corpus_extracted"]).first()
    assert ext["title"] == "Alpha & Co"
    assert "<p>" not in ext["text"] and "tracking" not in ext["text"]
    assert ext["text"].startswith("Alpha & Co\nthis paragraph")
    assert ext["n_chars"] == len(ext["text"])  # clean-text length
    # the quality gate saw clean text and the doc survived to packs
    filt = spark.read.parquet(out["corpus_filtered"])
    assert filt.count() == 1
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] == 1

    # extract_html without a WARC front door is a usage error
    import pytest as _pytest

    docs = spark.read.parquet(out["corpus_extracted"])
    with _pytest.raises(ValueError):
        corpus.run_corpus_pipeline(
            spark, docs, str(tmp_path / "z2"), extract_html=True
        )


def test_diversity_stage_cluster_balance(spark, tmp_path):
    """corpus_diverse keeps exactly the budget, spread across embedding
    strata — a naive global top-k by the quality prior (token count)
    would take every doc from the longer cluster."""
    rows = []
    for i in range(8):
        # ten doc-unique words keep pairwise jaccard ~0.5, well under
        # the 0.8 dedup threshold — every doc survives text dedup
        txt = _mk_doc([f"w{i}x{k}" for k in range(10)])
        if i < 4:  # cluster A docs are longer -> higher quality prior
            txt += " extra words pad the longer cluster members further out"
        rows.append((i + 1, txt, "en"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    emb = _embeddings(
        spark,
        {
            i + 1: ([10.0, float(i), 0.0] if i < 4 else [0.0, 10.0, float(i - 4)])
            for i in range(8)
        },
    )
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=100,
        embeddings=emb,
        semantic_threshold=0.999,
        diversity_budget=4,
        diversity_strata=2,
    )
    assert spark.read.parquet(out["corpus_semantic"]).count() == 8
    div = spark.read.parquet(out["corpus_diverse"])
    ids = sorted(r.doc_id for r in div.collect())
    assert len(ids) == 4
    # exact balance: 4+4 members, budget 4 -> Hamilton gives 2+2; the
    # quality prior ties within each cluster, so the id tie-break keeps
    # the two smallest ids per stratum
    assert ids == [1, 2, 5, 6]
    # packs build from the diverse zone
    packs = spark.read.parquet(out["corpus_packs"])
    assert packs.agg(F.sum("n_docs")).first()[0] == 4


def test_corpus_card_summarizes_run(spark, tmp_path):
    """The data-sheet frame: one row per executed zone in DAG order,
    token/char totals on document-shaped zones, NULLs on pack-shaped
    ones, exact permille retention between stages."""
    from peskas_mozambique_data_pipeline_spark.plans import report

    docs = _corpus(spark)
    out = corpus.run_corpus_pipeline(
        spark, docs, str(tmp_path / "zones"), budget=30, jaccard_threshold=0.5
    )
    card = report.corpus_card(spark, out).orderBy("pos").collect()
    zones = [r.zone for r in card]
    assert zones == ["corpus_filtered", "corpus_deduped", "corpus_packs"]
    by_zone = {r.zone: r for r in card}
    filt, dedup, packs = (
        by_zone["corpus_filtered"], by_zone["corpus_deduped"], by_zone["corpus_packs"]
    )
    assert filt.n_rows == 4 and dedup.n_rows == 2  # the _corpus fixture facts
    assert filt.retained_rows_permille is None  # no upstream zone
    assert dedup.retained_rows_permille == 2 * 1000 // 4
    # doc zones carry token/char totals; pack zone does not
    assert filt.n_tokens is not None and filt.n_chars is not None
    assert packs.n_tokens is None and packs.n_chars is None
    # exact token total: sum of whitespace tokens over the zone
    import re

    zdocs = spark.read.parquet(out["corpus_filtered"]).collect()
    want_tokens = sum(len(r.text.split()) for r in zdocs)
    assert filt.n_tokens == want_tokens
