"""Cross-corpus near-dup (new shard vs reference corpus): match
correctness against a brute-force python twin, best-match tie rules,
the anti-join filter, and plan shape (no cartesian, bucket-keyed)."""

from __future__ import annotations

import itertools

import pytest

from peskas_mozambique_data_pipeline_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the late afternoon sun"
)


def _edit(text, i, word):
    toks = text.split()
    toks[i] = word
    return " ".join(toks)


@pytest.fixture()
def corpora(spark):
    ref = spark.createDataFrame(
        [
            (100, BASE),
            (101, "completely unrelated reference text about spark shuffles "
                  "and partition pruning strategies for large tables"),
            (102, _edit(BASE, 3, "red")),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, BASE),                      # exact dup of ref 100
            (2, _edit(BASE, 5, "leaps")),   # near dup of ref 100/102
            (3, "totally fresh content discussing tokenizer fertility "
                "metrics and byte pair encoding merge tables at scale"),
        ],
        ["doc_id", "text"],
    )
    return new, ref


def _brute_jaccard(spark, new, ref, k=5):
    """Exact shingle-hash Jaccard for ALL cross pairs via the same
    shingle_hash_frame the operator uses (twin re-derives only the
    set math and the argmax)."""
    nh = {
        r["doc_id"]: set(r["_h32"])
        for r in dedup.shingle_hash_frame(new, shingle_k=k).collect()
    }
    rh = {
        r["doc_id"]: set(r["_h32"])
        for r in dedup.shingle_hash_frame(ref, shingle_k=k).collect()
    }
    out = {}
    for n, r in itertools.product(nh, rh):
        inter = len(nh[n] & rh[r])
        union = len(nh[n] | rh[r])
        out[(n, r)] = round(inter / union, 6) if union else 0.0
    return out


def test_matches_equal_brute_force(spark, corpora):
    new, ref = corpora
    got = {
        r["new_id"]: (r["ref_id"], r["jaccard"], r["n_ref_matches"])
        for r in dedup.cross_corpus_near_dups(
            new, ref, threshold=0.5
        ).collect()
    }
    brute = _brute_jaccard(spark, new, ref)
    want = {}
    for n in (1, 2, 3):
        hits = {r: j for (nn, r), j in brute.items() if nn == n and j >= 0.5}
        if hits:
            # best = max jaccard, ties to smallest ref id
            best = max(hits, key=lambda r: (hits[r], -r))
            want[n] = (best, hits[best], len(hits))
    # LSH at 8 hashes / 4 bands recalls everything this similar; if a
    # wanted pair were missed the assert below would catch it
    assert got == want
    assert 1 in got and got[1][0] == 100 and got[1][1] == 1.0
    assert 2 in got
    assert 3 not in got


def test_string_ids_best_match(spark, corpora):
    # the min_by(struct(ref, j), struct(-j, ref)) pick never negates
    # the id, so string doc ids work; lexicographic tie-break is the
    # string order analogue of "smallest reference id"
    from pyspark.sql import functions as F

    new, ref = corpora
    new_s = new.withColumn(
        "doc_id", F.concat(F.lit("n"), F.col("doc_id").cast("string"))
    )
    ref_s = ref.withColumn(
        "doc_id", F.concat(F.lit("r"), F.col("doc_id").cast("string"))
    )
    got = {
        r["new_id"]: (r["ref_id"], r["jaccard"], r["n_ref_matches"])
        for r in dedup.cross_corpus_near_dups(
            new_s, ref_s, threshold=0.5
        ).collect()
    }
    num = {
        r["new_id"]: (r["ref_id"], r["jaccard"], r["n_ref_matches"])
        for r in dedup.cross_corpus_near_dups(new, ref, threshold=0.5).collect()
    }
    assert got == {
        f"n{n}": (f"r{rid}", j, c) for n, (rid, j, c) in num.items()
    }


def test_filter_against_reference(spark, corpora):
    new, ref = corpora
    kept = dedup.filter_against_reference(new, ref, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {3}
    # full rows survive
    assert kept.columns == new.columns


def test_plan_no_cartesian(spark, corpora):
    new, ref = corpora
    plan = (
        dedup.cross_corpus_near_dups(new, ref)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
