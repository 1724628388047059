"""Hashed linear classifier: exact python twin of the NB fit (counts
pulled from the same Spark hashing, log-odds recomputed in Python),
exact integer scoring, separability end-to-end, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import classifier
from peskas_mozambique_data_pipeline_spark.operators.text import bpe_ish_tokens

DIM = 64  # tiny space so collisions are exercised


@pytest.fixture()
def labeled(spark):
    rows = [
        (0, "buy cheap pills now buy now", 0),
        (1, "cheap pills cheap deal", 0),
        (2, "the quarterly report shows steady growth", 1),
        (3, "the committee reviewed the annual report", 1),
        (4, "growth in the annual figures", 1),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def _token_features(spark, labeled):
    """(label, feature) occurrence counts via the SAME Spark hashing the
    operator uses — the twin only re-derives the math, not the hash."""
    rows = (
        labeled.select(
            "label", F.explode(bpe_ish_tokens("text")).alias("tok")
        )
        .filter("tok != ''")
        .select(
            "label",
            classifier.hashed_feature(F.col("tok"), DIM).alias("feature"),
        )
        .collect()
    )
    return [(r["label"], r["feature"]) for r in rows]


def test_fit_matches_python_twin(spark, labeled):
    alpha = 1.0
    weights, bias_nano = classifier.fit_hashed_nb(
        labeled, dim=DIM, alpha=alpha
    )
    got = {r["feature"]: r["w_nano"] for r in weights.collect()}

    occ = _token_features(spark, labeled)
    c1, c0 = {}, {}
    for y, f in occ:
        (c1 if y == 1 else c0)[f] = (c1 if y == 1 else c0).get(f, 0) + 1
    t1 = sum(1 for y, _ in occ if y == 1)
    t0 = sum(1 for y, _ in occ if y == 0)
    want = {}
    for f in set(c1) | set(c0):
        w = math.log((c1.get(f, 0) + alpha) / (t1 + alpha * DIM)) - math.log(
            (c0.get(f, 0) + alpha) / (t0 + alpha * DIM)
        )
        want[f] = round(w * 1e9)
    assert got == want
    d1, d = 3, 5
    assert bias_nano == round(math.log((d1 + alpha) / (d - d1 + alpha)) * 1e9)


def test_score_exact_integer_sum(spark, labeled):
    # hand-built 2-feature model: every token of doc 0 maps somewhere in
    # [0, DIM); give two of its features known weights and check the sum
    feats = (
        labeled.filter("doc_id = 0")
        .select(F.explode(bpe_ish_tokens("text")).alias("tok"))
        .select(classifier.hashed_feature(F.col("tok"), DIM).alias("f"))
        .collect()
    )
    counts = {}
    for r in feats:
        counts[r["f"]] = counts.get(r["f"], 0) + 1
    f_a, f_b = sorted(counts)[:2]
    weights = spark.createDataFrame(
        [(f_a, 3_000_000_000), (f_b, -1_250_000_000)], ["feature", "w_nano"]
    )
    out = classifier.score_hashed_linear(
        labeled, weights, dim=DIM, bias_nano=500_000_000
    )
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    want0 = (
        500_000_000 + counts[f_a] * 3_000_000_000 - counts[f_b] * 1_250_000_000
    ) / 1e9
    assert got[0] == want0
    # every doc comes back, including ones hitting no weighted feature
    assert set(got) == {0, 1, 2, 3, 4}
    prob0 = {r["doc_id"]: r["prob"] for r in out.collect()}[0]
    assert prob0 == 1.0 / (1.0 + math.exp(-want0))


def test_end_to_end_separates_classes(spark, labeled):
    weights, bias = classifier.fit_hashed_nb(labeled, dim=DIM)
    scored = classifier.score_hashed_linear(
        labeled, weights, dim=DIM, bias_nano=bias
    )
    by_label = {
        r["doc_id"]: (r["label"], r["score"]) for r in scored.collect()
    }
    spam = [s for (y, s) in by_label.values() if y == 0]
    ham = [s for (y, s) in by_label.values() if y == 1]
    assert max(spam) < min(ham)
    # held-out docs from each side score on the right side of the gap
    test = spark.createDataFrame(
        [(10, "cheap pills deal now"), (11, "the annual report shows growth")],
        ["doc_id", "text"],
    )
    t = {
        r["doc_id"]: r["score"]
        for r in classifier.score_hashed_linear(
            test, weights, dim=DIM, bias_nano=bias
        ).collect()
    }
    assert t[10] < t[11]


def test_empty_doc_scores_bias_only(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
    weights = spark.createDataFrame([(0, 10)], ["feature", "w_nano"])
    out = classifier.score_hashed_linear(
        df, weights, dim=DIM, bias_nano=2_000_000_000
    )
    assert {r["score"] for r in out.collect()} == {2.0}


def test_requires_both_classes(spark):
    df = spark.createDataFrame([(1, "a b", 1), (2, "c d", 1)], ["doc_id", "text", "label"])
    with pytest.raises(ValueError):
        classifier.fit_hashed_nb(df, dim=DIM)


def test_inference_plan_broadcasts_model(spark, labeled):
    weights = spark.createDataFrame([(1, 10)], ["feature", "w_nano"])
    plan = (
        classifier.score_hashed_linear(labeled, weights, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_map_tier_bit_equal_to_join_tier(spark, labeled):
    weights, bias = classifier.fit_hashed_nb(labeled, dim=DIM)
    wdict = {r["feature"]: r["w_nano"] for r in weights.collect()}
    join_tier = classifier.score_hashed_linear(
        labeled, weights, dim=DIM, bias_nano=bias
    )
    map_tier = classifier.score_hashed_linear_map(
        labeled, wdict, dim=DIM, bias_nano=bias
    )
    a = {r["doc_id"]: (r["score"], r["prob"]) for r in join_tier.collect()}
    b = {r["doc_id"]: (r["score"], r["prob"]) for r in map_tier.collect()}
    assert a == b  # exact, including the float division and sigmoid


def test_map_tier_plan_is_shuffle_free(spark, labeled):
    plan = (
        classifier.score_hashed_linear_map(labeled, {1: 10}, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_map_tier_rejects_oversized_models(spark, labeled):
    big = {i: 1 for i in range(65537)}
    with pytest.raises(ValueError):
        classifier.score_hashed_linear_map(labeled, big, dim=DIM)


def test_map_tier_scores_a_stream(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:01", "buy cheap pills now"),
        (2, "2024-01-01 00:00:02", "the annual report shows growth"),
    ]
    src = str(tmp_path / "landing")
    df = spark.createDataFrame(
        rows, "doc_id long, ts string, text string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(src)

    seed = spark.createDataFrame(
        [
            (100, "buy cheap pills now deal", 0),
            (101, "cheap pills now", 0),
            (102, "the annual report shows growth", 1),
            (103, "quarterly report growth figures", 1),
        ],
        ["doc_id", "text", "label"],
    )
    weights, bias = classifier.fit_hashed_nb(seed, dim=DIM)
    wdict = {r["feature"]: r["w_nano"] for r in weights.collect()}

    stream = si.stream_landing_zone(spark, src, spark.read.parquet(src).schema)
    scored = classifier.score_hashed_linear_map(
        stream, wdict, dim=DIM, bias_nano=bias
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = si.write_zone(scored, out_dir, ckpt)
    q.awaitTermination(120)
    out = {r["doc_id"]: r["score"] for r in spark.read.parquet(out_dir).collect()}
    assert set(out) == {1, 2}
    assert out[1] < out[2]
    # stream scores equal the batch map tier's (stateless => identical)
    batch = {
        r["doc_id"]: r["score"]
        for r in classifier.score_hashed_linear_map(
            df, wdict, dim=DIM, bias_nano=bias
        ).collect()
    }
    assert out == batch


def test_calibrate_threshold_exact_counts(spark):
    from peskas_mozambique_data_pipeline_spark.operators.classifier import (
        calibrate_threshold,
    )

    # scores with a clean separation point at 30: labels 1 above it
    rows = [
        (100, 1), (80, 1), (80, 1), (50, 0), (30, 1), (10, 0), (10, 0), (5, 0),
    ]
    df = spark.createDataFrame(rows, "score long, label int")
    got = {r["threshold"]: r for r in calibrate_threshold(df).collect()}

    # python twin over the same definition
    import collections
    per = collections.Counter()
    for s_, y in rows:
        per[s_] = per[s_]
    scores = sorted({s_ for s_, _ in rows}, reverse=True)
    total_pos = sum(1 for _, y in rows if y == 1)
    tp = fp = 0
    for t in scores:
        tp += sum(1 for s_, y in rows if s_ == t and y == 1)
        fp += sum(1 for s_, y in rows if s_ == t and y == 0)
        fn = total_pos - tp
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn), t
        assert r["precision_nano"] == (tp * 10**9) // (tp + fp)
        assert r["recall_nano"] == (tp * 10**9) // (tp + fn)
        assert r["f1_nano"] == (2 * tp * 10**9) // (2 * tp + fp + fn)

    # the best-F1 operating point is the separation threshold
    best = max(got.values(), key=lambda r: (r["f1_nano"], r["threshold"]))
    assert best["threshold"] == 30


def test_calibrate_threshold_default_matches_scorer_output(spark, labeled):
    """ADVICE r9: the default score_col must resolve on a frame coming
    straight out of either scoring tier (they emit double ``score`` and
    ``prob``, not ``score_nano``)."""
    weights, bias_nano = classifier.fit_hashed_nb(labeled, dim=DIM)
    scored = classifier.score_hashed_linear(
        labeled, weights, dim=DIM, bias_nano=bias_nano
    )
    table = calibrate_threshold_import()(scored).collect()
    # one row per distinct score, thresholds are the scores themselves
    assert {r["threshold"] for r in table} == {
        r["score"] for r in scored.select("score").distinct().collect()
    }
    # the perfectly separable fixture reaches F1 = 1.0 at some row
    assert max(r["f1_nano"] for r in table) == 10**9


def calibrate_threshold_import():
    from peskas_mozambique_data_pipeline_spark.operators.classifier import (
        calibrate_threshold,
    )

    return calibrate_threshold
