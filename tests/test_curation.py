"""Unit tests for operators/curation.py: per-group caps, snapshot
diffing, token-distribution drift."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import curation as cur


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )


def test_per_group_cap_respects_cap_and_determinism(spark):
    rows = [(i, f"t{i}", f"s{i % 3}", "en") for i in range(30)]
    df = _docs(spark, rows)
    out = cur.per_group_cap(df, group_col="source", cap=4, id_col="doc_id")
    kept = out.filter("_keep").groupBy("source").count().collect()
    assert all(r["count"] == 4 for r in kept)  # 10 per group, capped to 4
    # all rows survive with a tag, none dropped silently
    assert out.count() == 30
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.filter("_keep").collect())
    out2 = cur.per_group_cap(
        df.repartition(7), group_col="source", cap=4, id_col="doc_id"
    )
    b = sorted(r.doc_id for r in out2.filter("_keep").collect())
    assert a == b


def test_per_group_cap_null_group_is_capped(spark):
    # NULL group keys form ONE group (SQL PARTITION BY semantics); an
    # equi-join tag would never match NULL and leave the group uncapped
    rows = [(i, f"t{i}", None, "en") for i in range(10)] + [
        (100 + i, f"u{i}", "s0", "en") for i in range(2)
    ]
    out = cur.per_group_cap(
        _docs(spark, rows), group_col="source", cap=4, id_col="doc_id"
    )
    assert out.count() == 12
    kept_null = out.filter("_keep AND source IS NULL").count()
    assert kept_null == 4  # NULL group capped like any other
    assert out.filter("_keep AND source = 's0'").count() == 2  # under cap
    # deterministic under repartitioning, NULLs included
    a = sorted(r.doc_id for r in out.filter("_keep").collect())
    out2 = cur.per_group_cap(
        _docs(spark, rows).repartition(5), group_col="source", cap=4,
        id_col="doc_id",
    )
    assert a == sorted(r.doc_id for r in out2.filter("_keep").collect())


def test_per_group_cap_under_cap_groups_untouched(spark):
    rows = [(i, f"t{i}", "only", "en") for i in range(3)]
    out = cur.per_group_cap(
        _docs(spark, rows), group_col="source", cap=10, id_col="doc_id"
    )
    assert out.filter("_keep").count() == 3


def test_corpus_diff_statuses(spark):
    old = _docs(
        spark,
        [(1, "a", "s", "en"), (2, "b", "s", "en"), (3, "c", "s", "en")],
    )
    new = _docs(
        spark,
        [(2, "b", "s", "en"), (3, "c2", "s", "en"), (4, "d", "s2", "en")],
    )
    got = {
        r.doc_id: (r.status, r.source)
        for r in cur.corpus_diff(old, new).collect()
    }
    assert got == {
        1: ("removed", "s"),
        2: ("unchanged", "s"),
        3: ("changed", "s"),
        4: ("added", "s2"),
    }


def test_token_drift_zero_for_identical_distributions(spark):
    # both groups share the exact token distribution -> KL == 0
    rows = [(i, "a b c", "s", "en" if i % 2 else "fr") for i in range(10)]
    out = cur.token_distribution_drift(_docs(spark, rows), group_col="lang")
    for r in out.collect():
        assert r.kl_to_corpus == 0.0
        assert r.vocab == 3


def test_token_drift_matches_manual_kl(spark):
    # en: 4x"a" 1x"b"; fr: 1x"a" 4x"b"  -> symmetric positive KL
    rows = [
        (1, "a a a a b", "s", "en"),
        (2, "b b b b a", "s", "fr"),
    ]
    out = {
        r.lang: r.kl_to_corpus
        for r in cur.token_distribution_drift(
            _docs(spark, rows), group_col="lang"
        ).collect()
    }
    p, q = 0.8, 0.5
    expected = p * math.log(p / q) + (1 - p) * math.log((1 - p) / q)
    assert abs(out["en"] - expected) < 1e-6
    assert abs(out["fr"] - expected) < 1e-6
    assert out["en"] == out["fr"]  # symmetric construction


def test_per_group_cap_broadcast_plan(spark):
    """The over-cap tag join must broadcast the group list — capping a
    100 TB corpus must not shuffle the fact side to discover which
    groups are hot."""
    import contextlib
    import io

    rows = [(i, f"t{i}", f"s{i % 3}", "en") for i in range(30)]
    out = cur.per_group_cap(
        _docs(spark, rows), group_col="source", cap=4, id_col="doc_id"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temperature_resample_semantics(spark):
    # 3 domains with very different sizes; alpha=0.5 compresses the
    # share gap.  The largest-boost (smallest) domain keeps everything;
    # keeps are deterministic under repartitioning.
    rows = []
    for i in range(300):
        rows.append((i, "w " * 20, "big", "en"))
    for i in range(300, 360):
        rows.append((i, "w " * 20, "mid", "en"))
    for i in range(360, 372):
        rows.append((i, "w " * 20, "small", "en"))
    df = _docs(spark, rows)
    out = cur.temperature_resample(df, strata_col="source", alpha=0.5)
    assert out.count() == 372
    kept = {
        r.source: r.n
        for r in out.filter("_keep").groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert kept["small"] == 12  # max-boost domain keeps all rows
    # smaller domains keep a larger fraction than bigger ones
    assert kept["mid"] / 60 > kept["big"] / 300
    out2 = cur.temperature_resample(
        df.repartition(7), strata_col="source", alpha=0.5
    )
    a = sorted(r.doc_id for r in out.filter("_keep").collect())
    b = sorted(r.doc_id for r in out2.filter("_keep").collect())
    assert a == b


def test_temperature_resample_no_corpus_shuffle(spark):
    # the fact side must reach the output through a broadcast join
    # only — no Exchange of the documents table
    import contextlib
    import io as _io

    rows = [(i, "w " * 5, f"s{i % 3}", "en") for i in range(30)]
    out = cur.temperature_resample(_docs(spark, rows), strata_col="source")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_sample_topk_determinism_and_bias(spark):
    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        weighted_sample_topk,
    )

    rows = [(i, "g", 1000 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = weighted_sample_topk(df, k=20, weight_col="w", group_col="source")
    ids = {r.doc_id for r in got.collect()}
    assert len(ids) == 20
    # weight 1000 vs 1: the heavy minority should dominate the sample
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 15

    # reshuffle-proof: same sample from any partitioning
    again = {
        r.doc_id
        for r in weighted_sample_topk(
            df.repartition(13), k=20, weight_col="w", group_col="source"
        ).collect()
    }
    assert again == ids

    # zero/negative weights are excluded outright
    dfz = spark.createDataFrame(
        [(1, "g", 0), (2, "g", -5), (3, "g", 7)], "doc_id long, source string, w long"
    )
    kept = {r.doc_id for r in weighted_sample_topk(dfz, k=5, weight_col="w").collect()}
    assert kept == {3}


def test_ordering_mix_audit_clumped_vs_alternating(spark):
    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        ordering_mix_audit,
    )

    # clumped: AAAA BBBB -> same_rate 3/4 per source, share 1/2
    clumped = spark.createDataFrame(
        [(i, "a" if i < 4 else "b") for i in range(8)],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in ordering_mix_audit(clumped).collect()}
    assert out["a"]["n_same"] == 3 and out["a"]["n_pairs_from"] == 4
    assert out["a"]["same_rate"] == 0.75
    assert out["a"]["clump_ratio"] == 1.5  # 0.75 / 0.5
    # alternating: ABABABAB -> zero same-source adjacency
    alt = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(8)],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in ordering_mix_audit(alt).collect()}
    assert out["a"]["n_same"] == 0 and out["b"]["n_same"] == 0


# ---------------------------------------------------------------------------
# leakage_safe_split


def _split_fixture(spark):
    from peskas_mozambique_data_pipeline_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    # clusters {0,1,2} and {10,11}; everything else singleton
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
    )
    from peskas_mozambique_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(edges)
    return curation, docs, comp


def test_leakage_safe_split_clusters_never_straddle(spark):
    curation, docs, comp = _split_fixture(spark)
    out = curation.leakage_safe_split(
        docs, comp, {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(by_id) == 200
    assert by_id[0] == by_id[1] == by_id[2]
    assert by_id[10] == by_id[11]
    # all three splits are populated at n=200 and the shares are sane
    from collections import Counter

    shares = Counter(by_id.values())
    assert set(shares) == {"train", "val", "test"}
    assert shares["train"] > shares["val"]


def test_leakage_safe_split_deterministic_and_growth_stable(spark):
    curation, docs, comp = _split_fixture(spark)
    fr = {"train": 0.8, "test": 0.2}
    a = {
        r["doc_id"]: r["split"]
        for r in curation.leakage_safe_split(docs, comp, fr).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in curation.leakage_safe_split(docs, comp, fr).collect()
    }
    assert a == b
    # growing the corpus never moves an existing singleton's split
    bigger = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], ["doc_id", "text"]
    )
    c = {
        r["doc_id"]: r["split"]
        for r in curation.leakage_safe_split(bigger, comp, fr).collect()
    }
    assert all(c[i] == a[i] for i in range(200))


def test_leakage_safe_split_validates_fractions(spark):
    import pytest

    curation, docs, comp = _split_fixture(spark)
    with pytest.raises(ValueError):
        curation.leakage_safe_split(docs, comp, {"train": 0.5, "test": 0.4})


def test_token_shard_ids_equals_global_window(spark):
    """The two-phase distributed prefix sum must equal the single-node
    global running sum for ANY partitioning (here: forced to 7 range
    partitions over 200 rows with lumpy token counts)."""
    import random

    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        token_shard_ids,
    )

    rng = random.Random(77)
    data = [(i, rng.randint(1, 500)) for i in range(200)]
    df = spark.createDataFrame(data, "pos long, n_tok long").repartition(5)
    got = {
        r["pos"]: r["shard_id"]
        for r in token_shard_ids(
            df, order_col="pos", tokens_col="n_tok", shard_tokens=1000, n_parts=7
        ).collect()
    }
    cum = 0
    for pos, tok in data:  # already in pos order
        assert got[pos] == cum // 1000, pos
        cum += tok
    assert len(got) == 200


def test_shuffled_token_cum_equals_two_stage_pipeline(spark):
    """The fused shuffle+prefix-sum operator (r14) must reproduce the
    deterministic_shuffle -> token_cum_before two-stage pipeline
    bit-for-bit: same shuffle_pos, same tok_before, for a lumpy frame
    forced through a different partition count in each stage."""
    import random

    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        deterministic_shuffle,
        shuffled_token_cum,
        token_cum_before,
    )

    rng = random.Random(41)
    data = [(i, rng.randint(0, 400)) for i in range(300)]
    df = spark.createDataFrame(data, "doc_id long, n_tok long").repartition(4)

    ordered = deterministic_shuffle(df, "doc_id", salt="fuse_t", n_parts=7)
    two = {
        r["doc_id"]: (r["shuffle_pos"], r["tok_before"])
        for r in token_cum_before(
            ordered, "shuffle_pos", "n_tok", n_parts=5
        ).collect()
    }
    fused = {
        r["doc_id"]: (r["shuffle_pos"], r["tok_before"])
        for r in shuffled_token_cum(
            df, "doc_id", salt="fuse_t", tokens_col="n_tok", n_parts=7
        ).collect()
    }
    assert fused == two
    assert len(fused) == 300


# ---------------------------------------------------------------------------
# cluster_balanced_sample — diversity sampling with exact apportionment


def _cbs_frame(spark):
    from pyspark.sql import functions as F

    # 3 well-separated 4-d clusters with very different masses: 60 near
    # e0, 30 near e1, 10 near e2 — plus deterministic quality
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 60, F.array(F.lit(10.0), (F.col("id") % 7).cast("double") * 0.01, F.lit(0.0), F.lit(0.0)))
        .when(F.col("id") < 90, F.array(F.lit(0.0), F.lit(10.0), (F.col("id") % 5).cast("double") * 0.01, F.lit(0.0)))
        .otherwise(F.array(F.lit(0.0), F.lit(0.0), F.lit(10.0), (F.col("id") % 3).cast("double") * 0.01))
        .alias("embedding"),
        ((F.col("id") * 37 + 11) % 97).cast("long").alias("quality"),
    )
    cents = spark.createDataFrame(
        [(0, [10.0, 0.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0, 0.0]), (2, [0.0, 0.0, 10.0, 0.0])],
        "centroid_id int, centroid array<double>",
    )
    return df, cents


def _hamilton(counts, budget):
    total = sum(counts.values())
    quota = {c: budget * n // total for c, n in counts.items()}
    rem = {c: budget * n % total for c, n in counts.items()}
    leftover = budget - sum(quota.values())
    for c in sorted(rem, key=lambda c: (-rem[c], c))[:leftover]:
        quota[c] += 1
    return quota


def test_cluster_balanced_sample_twin(spark):
    """Exact budget, Hamilton apportionment and per-cluster quality
    top-k all match an independent python twin."""
    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        cluster_balanced_sample,
    )

    df, cents = _cbs_frame(spark)
    out = cluster_balanced_sample(df, cents, budget=23, quality_col="quality")
    got = sorted((r["centroid_id"], r["doc_id"]) for r in out.collect())

    # twin: cluster membership is geometric (3 well-separated blobs)
    members = {0: list(range(60)), 1: list(range(60, 90)), 2: list(range(90, 100))}
    counts = {c: len(m) for c, m in members.items()}
    alloc = _hamilton(counts, 23)
    want = []
    for c, m in members.items():
        by_quality = sorted(m, key=lambda i: (-((i * 37 + 11) % 97), i))
        want += [(c, i) for i in by_quality[: alloc[c]]]
    assert got == sorted(want)
    assert len(got) == 23


def test_cluster_balanced_sample_budget_exceeds_corpus(spark):
    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        cluster_balanced_sample,
    )

    df, cents = _cbs_frame(spark)
    out = cluster_balanced_sample(df, cents, budget=1000, quality_col="quality")
    assert out.count() == 100  # everything kept, no over-allocation


def test_cluster_balanced_sample_plan(spark):
    """Centroid + allocation joins broadcast; no Python in the plan."""
    from peskas_mozambique_data_pipeline_spark.operators.curation import (
        cluster_balanced_sample,
    )

    df, cents = _cbs_frame(spark)
    plan = cluster_balanced_sample(
        df, cents, budget=23, quality_col="quality"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
