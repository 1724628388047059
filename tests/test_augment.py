"""Deterministic augmentation transforms (operators/augment.py):
bit-exact python twins for the md5 cut-point arithmetic, structural
invariants, rate selection, and epoch re-salting."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import augment


def _u32(salt: str, doc_id: int) -> int:
    return int(hashlib.md5(f"{salt}_{doc_id}".encode()).hexdigest()[:8], 16)


def _docs(spark, n=30, n_tok=24):
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(n_tok))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fim_twin(doc_id: int, text: str, rate: float, salt: str, min_tokens: int = 8):
    toks = text.split()
    n = len(toks)
    pick = _u32(salt + "_pick", doc_id) % 1_000_000_000
    if pick >= round(rate * 1_000_000_000) or n < min_tokens:
        return text, False
    a = _u32(salt + "_a", doc_id) % (n - 1) + 1
    b = a + _u32(salt + "_b", doc_id) % (n - a) + 1
    pre, mid, suf = " ".join(toks[:a]), " ".join(toks[a:b]), " ".join(toks[b:])
    return (
        f"{augment.FIM_PRE}{pre} {augment.FIM_SUF} {suf} {augment.FIM_MID} {mid}",
        True,
    )


def test_fim_matches_python_twin_bit_exact(spark):
    docs = _docs(spark)
    out = {
        r["doc_id"]: (r["text"], r["fim_applied"])
        for r in augment.fim_transform(docs, rate=0.5, salt="fim0").collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    applied = 0
    for doc_id, text in src.items():
        want = _fim_twin(doc_id, text, 0.5, "fim0")
        assert out[doc_id] == want, doc_id
        applied += want[1]
    assert 0 < applied < len(src)  # rate actually selects a strict subset


def test_fim_structure_and_resalt(spark):
    docs = _docs(spark)
    out = augment.fim_transform(docs, rate=1.0, salt="fim0").collect()
    for r in out:
        assert r["fim_applied"]
        assert r["text"].startswith(augment.FIM_PRE)
        assert augment.FIM_SUF in r["text"] and augment.FIM_MID in r["text"]
        # token multiset is preserved (sentinels aside)
        body = (
            r["text"]
            .replace(augment.FIM_PRE, " ")
            .replace(augment.FIM_SUF, " ")
            .replace(augment.FIM_MID, " ")
        )
        assert sorted(body.split()) == sorted(
            f"w{r['doc_id']}t{j}" for j in range(24)
        )
    # a new epoch salt draws different cut points; same salt reproduces
    again = augment.fim_transform(docs, rate=1.0, salt="fim0").collect()
    assert sorted(r["text"] for r in again) == sorted(r["text"] for r in out)
    other = augment.fim_transform(docs, rate=1.0, salt="fim1").collect()
    assert sorted(r["text"] for r in other) != sorted(r["text"] for r in out)


def test_fim_short_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "only four tokens here")], "doc_id long, text string"
    )
    out = augment.fim_transform(docs, rate=1.0).collect()
    for r in out:
        assert not r["fim_applied"]
        assert augment.FIM_PRE not in r["text"]


def test_span_corrupt_invariants(spark):
    docs = _docs(spark, n=10, n_tok=30)
    out = augment.span_corrupt(docs, n_spans=2, span_len=3, salt="t5_0").collect()
    for r in out:
        assert r["corrupt_applied"]
        # each sentinel appears exactly once in inputs and once in targets
        for i in range(2):
            s = augment.SPAN_SENTINEL.format(i=i)
            assert r["inputs"].count(s) == 1
            assert r["targets"].count(s) == 1
        # removed + kept tokens reassemble the original multiset
        kept = [t for t in r["inputs"].split() if not t.startswith("<|extra")]
        removed = [t for t in r["targets"].split() if not t.startswith("<|extra")]
        assert sorted(kept + removed) == sorted(
            f"w{r['doc_id']}t{j}" for j in range(30)
        )
        assert len(removed) == 6  # n_spans * span_len


def test_span_corrupt_short_docs_null_targets(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    r = augment.span_corrupt(docs).collect()[0]
    assert not r["corrupt_applied"]
    assert r["targets"] is None
    assert r["inputs"] == "a b c d e"


def test_augment_plans_are_jvm_only(spark):
    """Both transforms must stay scan-shaped: no Python evaluation, no
    exchange (pure per-row column expressions)."""
    import contextlib
    import io

    docs = _docs(spark)
    for df in (
        augment.fim_transform(docs, rate=1.0),
        augment.span_corrupt(docs),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan
