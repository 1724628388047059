"""Concat-and-split sequence layout (operators/curation.py):
the GPT-style pretraining placement — docs concatenated in training
order, cut into fixed-length sequences — plus the per-sequence span
manifest, and the graded contamination score."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import curation, text as text_ops


def _docs(spark, toks):
    return spark.createDataFrame(
        [(i, i, t) for i, t in enumerate(toks)],
        "doc_id long, shuffle_pos long, n_tokens long",
    )


def _python_layout(toks, L):
    out, cum = [], 0
    for i, t in enumerate(toks):
        seq_id = cum // L
        end_seq = (cum + t - 1) // L if t > 0 else seq_id
        out.append((i, cum, seq_id, cum % L, end_seq, end_seq - seq_id + 1))
        cum += t
    return out


@pytest.mark.parametrize("L", [4, 7, 100])
def test_concat_split_layout_matches_python_twin(spark, L):
    toks = [3, 0, 9, 1, 4, 25, 2, 0, 6]
    got = {
        r["doc_id"]: (
            r["doc_id"], r["tok_before"], r["seq_id"], r["seq_offset"],
            r["end_seq"], r["n_seqs"],
        )
        for r in curation.concat_split_layout(
            _docs(spark, toks), seq_len=L, n_parts=3
        ).collect()
    }
    for want in _python_layout(toks, L):
        assert got[want[0]] == want


def test_concat_split_layout_partitioning_invariant(spark):
    toks = [5, 13, 1, 8, 2, 21, 3]
    a = curation.concat_split_layout(_docs(spark, toks), seq_len=8, n_parts=1)
    b = curation.concat_split_layout(
        _docs(spark, toks).repartition(5), seq_len=8, n_parts=4
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(a) == key(b)


def test_sequence_manifest_covers_every_token_exactly_once(spark):
    toks = [3, 9, 1, 4, 25, 2, 6]
    L = 8
    layout = curation.concat_split_layout(_docs(spark, toks), seq_len=L)
    man = curation.sequence_manifest(layout, seq_len=L).collect()
    total = sum(toks)
    # spans tile the token stream: per sequence they abut, begin<end,
    # and the summed span lengths equal the corpus token count
    assert sum(r["n_tok_in_seq"] for r in man) == total
    by_seq: dict[int, list] = {}
    for r in man:
        assert 0 <= r["begin_in_seq"] < r["end_in_seq"] <= L
        by_seq.setdefault(r["seq_id"], []).append(r)
    n_seqs = (total + L - 1) // L
    assert set(by_seq) == set(range(n_seqs))
    for sid, rows in by_seq.items():
        rows.sort(key=lambda r: r["begin_in_seq"])
        assert rows[0]["begin_in_seq"] == 0
        for a, b in zip(rows, rows[1:]):
            assert a["end_in_seq"] == b["begin_in_seq"]
        want_end = L if sid < n_seqs - 1 else total - sid * L
        assert rows[-1]["end_in_seq"] == want_end
    # empty docs occupy no span
    assert all(r["n_tok_in_seq"] > 0 for r in man)


def test_token_shard_ids_unchanged_by_refactor(spark):
    # the shared prefix sum must reproduce the pre-refactor semantics:
    # shard = tokens-before div budget over the total order
    toks = [10, 10, 10, 10, 10]
    out = curation.token_shard_ids(
        _docs(spark, toks), shard_tokens=25, n_parts=2
    ).collect()
    got = {r["doc_id"]: r["shard_id"] for r in out}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_contamination_score_fraction_and_boolean_agree(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog entirely"),
            (2, "completely unrelated words about maritime navigation charts"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "quick brown fox jumps over")], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r
        for r in text_ops.contamination_score(train, bench, n=5).collect()
    }
    flagged = {
        r["doc_id"]: r
        for r in text_ops.ngram_contamination(train, bench, n=5).collect()
    }
    for d in (1, 2, 3):
        assert scored[d]["n_overlap"] == flagged[d]["n_overlap"]
        assert (scored[d]["overlap_frac"] > 0) == flagged[d]["contaminated"]
    assert scored[1]["n_overlap"] == 1  # exactly the shared 5-gram
    assert scored[1]["n_grams"] == 6    # 10 tokens -> 6 distinct 5-grams
    assert scored[3]["n_grams"] == 0 and scored[3]["overlap_frac"] == 0.0


def test_stage_seq_layout_in_corpus_dag(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.plans import corpus

    docs = spark.createDataFrame(
        [
            (i, "w%d " % i + "a genuinely informative sentence with "
             "plenty of distinct words ends here. " * (3 + i % 4), "en")
            for i in range(12)
        ],
        "doc_id long, text string, lang string",
    )
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        str(tmp_path / "zones"),
        budget=10_000,
        jaccard_threshold=0.99,
        shuffle_salt="e1",
        seq_len=16,
    )
    assert "sequence_layout" in out
    layout = spark.read.parquet(out["sequence_layout"])
    tok_col = "pack_tokens" if "pack_tokens" in layout.columns else "n_tokens"
    total = layout.agg(F.sum(tok_col)).first()[0]
    spans = spark.read.parquet(out["sequence_layout"] + "/_spans")
    # spans tile the packed token stream exactly
    assert spans.agg(F.sum("n_tok_in_seq")).first()[0] == total
    n_seqs = (total + 15) // 16
    assert spans.select("seq_id").distinct().count() == n_seqs
    # reading the zone root does NOT pick up the _spans side dir
    assert "begin_in_seq" not in layout.columns


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_concat_split_layout_plan_shape(spark):
    # post-checkpoint the visible plan is: broadcast offsets join +
    # per-partition windows — never a sort-merge join, never Python.
    # (The range exchange sits BEFORE the lineage-truncating
    # checkpoint, so it can't appear here; its effect — the total
    # order — is what the python-twin/partitioning-invariance tests
    # pin.)
    toks = list(range(50))
    lay = curation.concat_split_layout(_docs(spark, toks), seq_len=7, n_parts=4)
    plan = _plan(lay)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_score_broadcasts_benchmark(spark):
    # the GRAM join must broadcast the benchmark digests — a shuffle on
    # the Zipf-skewed gram key (_gh) is the anti-pattern; the doc-id
    # join-back is corpus-grain on both sides, so a sort-merge there
    # is legitimate
    train = spark.createDataFrame(
        [(i, "some words repeated across documents %d" % i) for i in range(50)],
        "doc_id long, text string",
    )
    bench = train.filter(F.col("doc_id") % 7 == 0)
    plan = _plan(text_ops.contamination_score(train, bench, n=3))
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "_gh" not in line, line


def test_export_shards_jsonl_format(spark, tmp_path):
    import glob
    import gzip as _gzip
    import json as _json

    from peskas_mozambique_data_pipeline_spark.operators import curation
    from peskas_mozambique_data_pipeline_spark.plans import corpus
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    zones = PipelineZones(str(tmp_path / "zones"))
    shuffled = spark.createDataFrame(
        [(i, i, "doc %d body" % i, 10) for i in range(8)],
        "doc_id long, shuffle_pos long, text string, n_tokens long",
    )
    zones.write(shuffled, "corpus_shuffled")
    path = corpus.stage_export_shards(
        spark, zones, shard_tokens=30, fmt="jsonl"
    )
    # gzip jsonl files under shard_id dirs, manifest alongside
    files = glob.glob(path + "/shard_id=*/*.json.gz")
    assert files
    with _gzip.open(files[0], "rt") as f:
        row = _json.loads(f.readline())
    assert "text" in row and "doc_id" in row
    man = _json.load(open(path + "/_manifest.json"))
    assert man["n_shards"] == 3  # 80 tokens / 30 budget
    assert spark.read.json(path).count() == 8

    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.stage_export_shards(spark, zones, fmt="csv")
