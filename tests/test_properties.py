"""Property-based checks (SURVEY §5.4): unpivot/pivot round-trip,
calendar completion coverage, flag monotonicity, catch-model
non-negativity."""

from __future__ import annotations

import pytest

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import reshape
from peskas_mozambique_data_pipeline_spark.plans import validate as val

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
)


@SET
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=6))
def test_unpivot_pivot_roundtrip(spark, rows_in):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows_in)], "id int, m1 double, m2 double"
    )
    long = reshape.unpivot(df, ["id"], ["m1", "m2"])
    wide = reshape.pivot_wider(long, ["id"], "metric_type", "metric_value", ["m1", "m2"])
    got = sorted(tuple(r) for r in wide.collect())
    expect = sorted((i, a, b) for i, (a, b) in enumerate(rows_in))
    assert got == expect


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2"]),
            st.dates(min_value=datetime.date(2023, 1, 1), max_value=datetime.date(2024, 12, 1)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_complete_months_covers_span(spark, rows_in):
    df = spark.createDataFrame(
        [(d, datetime.date(dt.year, dt.month, 1), 1.0) for d, dt in rows_in],
        "district string, month date, v double",
    ).dropDuplicates(["district", "month"])
    out = reshape.complete_months(df, ["district"], "month")
    months = sorted({datetime.date(dt.year, dt.month, 1) for _, dt in rows_in})
    lo, hi = months[0], months[-1]
    n_months = (hi.year - lo.year) * 12 + (hi.month - lo.month) + 1
    n_districts = len({d for d, _ in rows_in})
    assert out.count() == n_months * n_districts
    # every district covers the full spine
    per = out.groupBy("district").count().collect()
    assert all(r["count"] == n_months for r in per)


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.1, max_value=59.0),  # duration
            st.floats(min_value=1.0, max_value=10.0),  # fishers
        ),
        min_size=1,
        max_size=5,
    )
)
@pytest.mark.slow
def test_flag_monotonicity(spark, trips):
    """Adding a violation to a row never removes existing flags."""
    base = spark.createDataFrame(
        [
            (f"s{i}", "1", "1", "SNA", 30.0, d, f, None, None, None, 5.0,
             datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 1))
            for i, (d, f) in enumerate(trips)
        ],
        "submission_id string, survey_activity string, catch_outcome string, "
        "catch_taxon string, length double, trip_duration double, "
        "n_fishers double, n_buckets double, weight_bucket double, "
        "n_individuals double, catch_kg double, "
        "submission_date timestamp, landing_date timestamp",
    )
    base = val.attach_taxa_bounds(base, None)
    worse = base.withColumn("trip_duration", F.lit(99.0))
    f_base = {
        r.submission_id: set((r.alert_flag or "").split(",")) - {""}
        for r in val.apply_rule_flags(base).collect()
    }
    f_worse = {
        r.submission_id: set((r.alert_flag or "").split(",")) - {""}
        for r in val.apply_rule_flags(worse).collect()
    }
    for sid, flags in f_base.items():
        assert flags <= f_worse[sid]
        assert "12" in f_worse[sid]


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.001, max_value=1.0),  # a
            st.floats(min_value=2.5, max_value=3.5),    # b
            st.floats(min_value=1.0, max_value=100.0),  # L
            st.integers(min_value=1, max_value=50),     # N
        ),
        min_size=1,
        max_size=6,
    )
)
def test_catch_model_non_negative(spark, rows_in):
    df = spark.createDataFrame(rows_in, "a double, b double, L double, N int")
    out = df.select(
        (F.col("a") * F.pow(F.col("L"), F.col("b")) * F.col("N") / 1000.0).alias("kg")
    )
    assert all(r.kg >= 0 for r in out.collect())


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=25, unique=True),
    st.integers(min_value=2, max_value=6),
    st.sampled_from(["hot", None]),
)
@pytest.mark.slow
def test_triangle_self_join_equals_brute_force(spark, ids, n_parts, one_block):
    # every unordered within-block pair exactly once, any part count,
    # whether rows share one block or split across two
    from peskas_mozambique_data_pipeline_spark.operators.skew import triangle_self_join

    rows = [(("hot" if one_block else ("b" + str(i % 2))), i) for i in ids]
    df = spark.createDataFrame(rows, "label string, id long")
    got = sorted(
        (r.label, min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in triangle_self_join(df, ["label"], "id", n_parts=n_parts).collect()
    )
    expect = sorted(
        (la, min(a, b), max(a, b))
        for la, a in rows
        for lb, b in rows
        if la == lb and a < b
    )
    assert got == expect


@SET
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=7), min_size=1, max_size=12, unique=True
    ),
    st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
def test_blocked_levenshtein_equals_crossjoin(spark, names_in, k):
    from peskas_mozambique_data_pipeline_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
    )

    names = spark.createDataFrame([(n,) for n in names_in], ["name"])
    got = sorted(
        (r.name, r.cand)
        for r in blocked_levenshtein_pairs(names, "name", max_dist=k).collect()
    )
    a, b = names.alias("a"), names.alias("b")
    expect = sorted(
        (r.name, r.cand)
        for r in a.crossJoin(b)
        .select(F.col("a.name").alias("name"), F.col("b.name").alias("cand"))
        .filter(F.levenshtein("name", "cand", k) >= 0)
        .filter(F.levenshtein("name", "cand", k) <= k)
        .collect()
    )
    assert got == expect


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.sampled_from(["x", "y", None]),  # attr
            st.integers(min_value=0, max_value=20),  # day offset
        ),
        min_size=1,
        max_size=12,
    )
)
def test_scd2_versions_partition_timeline(spark, events_in):
    # versions of one key tile its timeline: valid_from strictly
    # increasing, each valid_to equals the next valid_from, exactly one
    # open version per key, attrs never repeat consecutively
    import datetime as _dt

    from peskas_mozambique_data_pipeline_spark.operators.merge import scd2_from_events

    rows = [
        (k, a, _dt.date(2024, 1, 1) + _dt.timedelta(days=d), i)
        for i, (k, a, d) in enumerate(events_in)
    ]
    df = spark.createDataFrame(rows, "k long, attr string, d date, tk long")
    out = scd2_from_events(df, "k", "attr", "d", tiebreak="tk").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in vs if r.is_current) == 1
        assert vs[-1].valid_to is None
        for prev, nxt in zip(vs, vs[1:]):
            assert prev.valid_to == nxt.valid_from
            assert not (
                prev.attr == nxt.attr or (prev.attr is None and nxt.attr is None)
            )


words = st.sampled_from(["a", "b", "c", "dd", "eee"])


@SET
@given(st.lists(st.lists(words, min_size=1, max_size=20), min_size=1, max_size=5))
def test_repetition_feature_invariants(spark, docs_in):
    from peskas_mozambique_data_pipeline_spark.operators.text import (
        repetition_features,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_in)], "doc_id long, text string"
    )
    for r in repetition_features(df).collect():
        for n in (1, 2, 3):
            top = getattr(r, f"top{n}gram_frac")
            dup = getattr(r, f"dup{n}gram_frac")
            if top is None:  # doc shorter than n tokens
                assert dup is None
                continue
            assert 0.0 < top <= 1.0
            assert 0.0 <= dup <= 1.0
            # any repeated gram implies the modal gram is repeated, and
            # duplicated instances then include at least the modal ones
            if dup > 0:
                assert dup >= top - 1e-9
        ws = docs_in[r.doc_id]
        # exact modal unigram fraction
        expect_top1 = max(ws.count(w) for w in set(ws)) / len(ws)
        assert abs(r.top1gram_frac - round(expect_top1, 6)) < 1e-9


@SET
@given(
    st.lists(st.lists(words, min_size=3, max_size=12), min_size=1, max_size=4),
    st.lists(st.lists(words, min_size=3, max_size=12), min_size=1, max_size=2),
)
@pytest.mark.slow
def test_contamination_matches_python_set_overlap(spark, train_in, bench_in):
    from peskas_mozambique_data_pipeline_spark.operators.text import (
        ngram_contamination,
    )

    def grams3(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    train = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(train_in)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1000 + i, " ".join(ws)) for i, ws in enumerate(bench_in)],
        "doc_id long, text string",
    )
    bench_grams = set().union(*(grams3(ws) for ws in bench_in))
    got = {r.doc_id: r.n_overlap for r in ngram_contamination(train, bench, n=3).collect()}
    for i, ws in enumerate(train_in):
        assert got[i] == len(grams3(ws) & bench_grams)


@SET
@given(
    st.lists(st.lists(words, min_size=3, max_size=12), min_size=1, max_size=4),
    st.lists(st.lists(words, min_size=3, max_size=12), min_size=1, max_size=2),
    st.sampled_from([1, 4]),  # n_words: saturated 64-bit and roomy filters
)
@pytest.mark.slow
def test_bloom_decontaminate_equals_exact_for_any_corpus(
    spark, train_in, bench_in, n_words
):
    """Two-phase bloom decontamination ≡ single-phase exact join for
    arbitrary corpora and filter widths (the bloom may only ADD
    phase-1 candidates, never drop one — phase 2 restores exactness)."""
    from peskas_mozambique_data_pipeline_spark.operators.text import (
        bloom_decontaminate,
        ngram_contamination,
    )

    train = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(train_in)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1000 + i, " ".join(ws)) for i, ws in enumerate(bench_in)],
        "doc_id long, text string",
    )
    exact = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in ngram_contamination(train, bench, n=3).collect()
    }
    got = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in bloom_decontaminate(
            train, bench, n=3, n_words=n_words, k=2
        ).collect()
    }
    assert got == exact


@SET
@given(st.integers(min_value=1, max_value=500), st.sampled_from([0.25, 0.5, 1.0]))
@pytest.mark.slow
def test_stratified_sample_is_exact_subset_semantics(spark, n, frac):
    from peskas_mozambique_data_pipeline_spark.operators.text import (
        deterministic_uniform,
        stratified_sample,
    )

    df = spark.createDataFrame([(i, "s") for i in range(n)], "doc_id long, lang string")
    kept = {r.doc_id for r in stratified_sample(df, {"s": frac}, "lang").collect()}
    # membership is exactly u(id) < frac, row by row
    us = {
        r.doc_id: r.u
        for r in df.select("doc_id", deterministic_uniform("doc_id").alias("u")).collect()
    }
    assert kept == {i for i in range(n) if us[i] < frac}


@SET
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12),
    st.sampled_from([10, 25, 100]),
)
def test_pack_documents_conservation_and_order(spark, tok_counts, budget):
    from peskas_mozambique_data_pipeline_spark.operators.text import pack_documents

    rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate(tok_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    packs = pack_documents(df, budget=budget).collect()

    # conservation: every doc and every token lands in exactly one pack
    assert sum(p.n_docs for p in packs) == len(tok_counts)
    assert sum(p.pack_tokens for p in packs) == sum(tok_counts)
    # contiguity + order: sorted by pack_id, the doc-id ranges tile the
    # input without overlap, and pack ids never decrease along doc order
    spans = [(p.pack_id, p.first_doc, p.last_doc) for p in sorted(packs)]
    expect_next = 0
    for _pid, first, last in spans:
        assert first == expect_next
        assert last >= first
        expect_next = last + 1
    assert expect_next == len(tok_counts)
    # binning law: pack of doc i == tokens-before-i // budget
    cum = 0
    pack_of = {}
    for i, n in enumerate(tok_counts):
        pack_of[i] = cum // budget
        cum += n
    for pid, first, last in spans:
        for i in range(first, last + 1):
            assert pack_of[i] == pid


@SET
@given(
    st.lists(
        # docs = small random token sequences over a tight vocab so
        # overlapping shingle sets (and threshold-straddling Jaccards)
        # actually occur
        st.lists(st.sampled_from(list("abcdefgh")), min_size=5, max_size=12),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@pytest.mark.slow
def test_jaccard_prefix_join_complete_on_random_corpora(spark, token_lists, threshold):
    """Prefix filtering + size filtering must be LOSSLESS at every
    threshold: blocked result == brute force, including boundary
    Jaccards like 3/10 at t=0.3."""
    from peskas_mozambique_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    hashed = dd.shingle_hash_frame(docs, materialize=True)
    if hashed.count() < 2:
        return  # all docs under the shingle minimum — nothing to join
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.jaccard_prefix_pairs(hashed, threshold=threshold).collect()
    }
    all_pairs = (
        hashed.select(F.col("doc_id").alias("id_a"))
        .crossJoin(hashed.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    brute = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.jaccard_verify_hashed(hashed, all_pairs)
        .filter(F.col("jaccard") >= threshold)
        .collect()
    }
    assert got == brute


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
@pytest.mark.slow
def test_per_group_cap_properties(spark, rows_in, cap):
    """For ANY corpus and cap: every group keeps min(cap, group size)
    rows, no row is lost or invented, and the kept set is independent
    of partitioning."""
    from peskas_mozambique_data_pipeline_spark.operators import curation as cur

    df = spark.createDataFrame(
        [(i, f"t{i}", g, "en") for i, g in rows_in],
        "doc_id long, text string, source string, lang string",
    )
    out = cur.per_group_cap(df, group_col="source", cap=cap, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == len(rows_in)
    by_group: dict[str, int] = {}
    for r in rows:
        if r._keep:
            by_group[r.source] = by_group.get(r.source, 0) + 1
    sizes: dict[str, int] = {}
    for _, g in rows_in:
        sizes[g] = sizes.get(g, 0) + 1
    assert by_group == {g: min(cap, n) for g, n in sizes.items()}
    out2 = cur.per_group_cap(
        df.repartition(5), group_col="source", cap=cap, id_col="doc_id"
    )
    assert sorted(r.doc_id for r in rows if r._keep) == sorted(
        r.doc_id for r in out2.collect() if r._keep
    )


@SET
@given(
    st.lists(  # intervals: (id, start_s, length_s)
        st.tuples(
            st.integers(min_value=0, max_value=86_400 * 2),
            st.integers(min_value=0, max_value=86_400),
        ),
        min_size=1,
        max_size=10,
    ),
    st.lists(st.integers(min_value=0, max_value=86_400 * 3), min_size=1, max_size=12),
    st.sampled_from([3600, 21_600, 90_000]),
)
@pytest.mark.slow
def test_interval_join_equals_theta_join(spark, iv_in, pt_in, bin_seconds):
    """interval_join must emit EXACTLY the (point, interval) pairs the
    naive theta join defines, for any bin width — bins dial cost, never
    semantics."""
    import datetime

    from peskas_mozambique_data_pipeline_spark.operators.joins import interval_join

    epoch = datetime.datetime(2024, 1, 1)
    ivs = [
        (i, epoch + datetime.timedelta(seconds=s), epoch + datetime.timedelta(seconds=s + d))
        for i, (s, d) in enumerate(iv_in)
    ]
    pts = [(j, epoch + datetime.timedelta(seconds=s)) for j, s in enumerate(pt_in)]
    intervals = spark.createDataFrame(ivs, "iv_id long, t_start timestamp, t_end timestamp")
    points = spark.createDataFrame(pts, "pt_id long, ts timestamp")
    got = {
        (r.pt_id, r.iv_id)
        for r in interval_join(
            points, intervals, "ts", "t_start", "t_end", bin_seconds=bin_seconds
        ).select("pt_id", "iv_id").collect()
    }
    expect = {
        (j, i)
        for i, s, e in ivs
        for j, p in pts
        if s <= p <= e
    }
    assert got == expect


@SET
@given(
    st.lists(  # (day offset, value) observations for one key
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_gap_fill_matches_python_reference(spark, obs_in):
    """gap_fill_interpolate == the obvious python LOCF/interp per day."""
    import datetime

    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    d0 = datetime.date(2024, 1, 1)
    obs = sorted((d0 + datetime.timedelta(days=d), v) for d, v in obs_in)
    df = spark.createDataFrame(
        [("k", d, v) for d, v in obs], "k string, day date, vq long"
    )
    out = {
        r.day: (r.value_q, r.locf_q, r.interp_q)
        for r in gap_fill_interpolate(df, ["k"], "day", "vq").collect()
    }
    days = [obs[0][0] + datetime.timedelta(days=i)
            for i in range((obs[-1][0] - obs[0][0]).days + 1)]
    assert set(out) == set(days)
    lookup = dict(obs)
    for day in days:
        vq, locf, interp = out[day]
        prev = max((d, v) for d, v in obs if d <= day)
        nxt = min(((d, v) for d, v in obs if d >= day), default=None)
        assert locf == prev[1]
        assert vq == lookup.get(day)
        if day in lookup:
            assert interp == lookup[day]
        else:
            # bracketed: python floor-div interpolation, matching div
            (pd_, pv), (nd, nv) = prev, nxt
            num = (nv - pv) * (day - pd_).days
            den = (nd - pd_).days
            # Spark's `div` truncates toward zero like DuckDB //? No:
            # div is integer division truncating toward zero on
            # BIGINT; python // floors.  Use the same trunc semantics.
            q = num // den if (num >= 0) == (den >= 0) else -((-num) // den)
            assert interp == pv + q


@SET
@given(
    st.lists(  # (seconds offset, value) ticks, unique ts
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_time_weighted_mean_matches_python_reference(spark, ticks_in):
    import datetime

    from peskas_mozambique_data_pipeline_spark.operators.timeseries import (
        time_weighted_mean,
    )

    epoch = datetime.datetime(2024, 1, 1)
    ticks = sorted(ticks_in)
    df = spark.createDataFrame(
        [("k", epoch + datetime.timedelta(seconds=s), float(v)) for s, v in ticks],
        "k string, ts timestamp, v double",
    )
    rows = time_weighted_mean(df, ["k"], "ts", "v").collect()
    # python reference: micro-unit values x whole-second holds
    holds = [
        (round(v * 1e6), ticks[i + 1][0] - s)
        for i, (s, v) in enumerate(ticks[:-1])
    ]
    total = sum(d for _, d in holds)
    if total == 0:
        assert rows == []  # all-zero-duration keys are filtered
    else:
        (r,) = rows
        assert r.n_obs == len(ticks)
        assert r.total_dur_s == total
        expect = (sum(q * d for q, d in holds) / total) / 1e6
        # the operator emits ROUND(..., 6) (oracle convention) — allow
        # one half-ulp of that rounding
        assert abs(r.tw_mean - expect) <= 5.000001e-7


words = st.sampled_from(["cat", "dog", "fish", "net", "boat", "reef"])


@SET
@given(
    st.lists(st.lists(words, min_size=1, max_size=12), min_size=1, max_size=6),
    st.lists(words, min_size=1, max_size=4),
)
@pytest.mark.slow
def test_bm25_tiers_agree_on_random_corpora(spark, docs_in, terms):
    """Scan-local and inverted-index BM25 produce identical
    (doc, n_terms_hit, score) sets for any corpus and any query term
    multiset (duplicates included) — the cross-tier contract behind
    their shared oracle row."""
    from peskas_mozambique_data_pipeline_spark.operators import text as t

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_in)],
        "doc_id long, text string",
    )
    scan = sorted(
        (r.doc_id, r.n_terms_hit, r.score)
        for r in t.bm25_topk(df, terms, k=50).collect()
    )
    indexed = sorted(
        (r.doc_id, r.n_terms_hit, r.score)
        for r in t.bm25_topk_indexed(df, terms, k=50).collect()
    )
    assert scan == indexed


_url_path_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_", min_size=1, max_size=8
)
_url_param_key = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)


@SET
@given(
    scheme=st.sampled_from(["http", "https"]),
    www=st.booleans(),
    host_case=st.booleans(),
    segs=st.lists(_url_path_seg, max_size=3),
    trailing=st.booleans(),
    params=st.lists(
        st.tuples(_url_param_key, st.integers(0, 99)), max_size=3, unique_by=lambda t: t[0]
    ),
    tracking=st.lists(st.sampled_from(["utm_source=x", "gclid=1", "fbclid=2"]), max_size=2),
    fragment=st.booleans(),
    data=st.data(),
)
def test_canonical_url_invariant_under_refetch_variants(
    spark, scheme, www, host_case, segs, trailing, params, tracking, fragment, data
):
    """Any two refetch variants of one logical page — differing scheme,
    www prefix, host case, trailing slash, param order, tracking params,
    fragment — canonicalize to the SAME key, and canonicalization is
    stable (applying the variant generator twice changes nothing)."""
    from peskas_mozambique_data_pipeline_spark.operators import web

    def build(scheme, www, upper, order, with_tracking, frag, trail):
        host = "Example.COM" if upper else "example.com"
        if www:
            host = "www." + host
        path = "/" + "/".join(segs) if segs else ""
        if trail and path:
            path += "/"
        qs = [f"{k}={v}" for k, v in order]
        if with_tracking:
            qs += tracking
        q = ("?" + "&".join(qs)) if qs else ""
        f = "#frag" if frag else ""
        return f"{scheme}://{host}{path}{q}{f}"

    # a second, independently drawn variant of the same logical page
    perm = data.draw(st.permutations(params))
    u1 = build(scheme, www, host_case, params, True, fragment, trailing)
    u2 = build(
        "https" if scheme == "http" else "http",
        not www,
        not host_case,
        perm,
        False,
        not fragment,
        False,
    )
    df = spark.createDataFrame([(u1,), (u2,)], ["url"])
    keys = [r["v"] for r in df.select(web.canonical_url("url").alias("v")).collect()]
    assert keys[0] == keys[1]
    assert keys[0] is not None


# adversarial-ish HTML: tags, half-tags, entities, random text — the
# extractor must be total (never throw) and must leave no markup behind
_html_atoms = st.one_of(
    # no '&' in the free-text alphabet: assembled entities like &lt;
    # legitimately DECODE to literal angle brackets in clean output
    # (the one-level-decode contract), which is not a markup leak
    st.text(
        alphabet="abz <>;#/\"'=\n\t!-pcriotsl0129", min_size=0, max_size=12
    ),
    st.sampled_from(
        [
            "<p>", "</p>", "<script>", "</script>", "<style>x{}</style>",
            "<!--", "-->", "&amp;", "&#65;", "&#x41;", "<br/>",
            "<a href='x'>", "</a>", "<div", ">", "<<>>", "&bogus;",
            "<script>var a='<p>';</script>",
        ]
    ),
)


@SET
@given(st.lists(_html_atoms, min_size=0, max_size=12))
def test_strip_html_total_and_tag_free(spark, parts):
    """strip_html on arbitrary tag soup: never throws, and the output
    contains no '<tag' remnants (a lone '<' from text like 'a < b' is
    legitimate — only markup must die)."""
    import re

    from peskas_mozambique_data_pipeline_spark.operators import html as html_ops

    body = "".join(parts)
    df = spark.createDataFrame([(1, body)], "doc_id long, text string")
    out = html_ops.extract_html_text(df, html_col="text").collect()
    assert len(out) == 1
    text = out[0]["text"] or ""
    # no complete tag survives extraction
    assert not re.search(r"<[a-zA-Z/][^<]*>", text), (body, text)


@SET
@given(st.lists(st.integers(min_value=-(2**15), max_value=2**15 - 1),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=5))
def test_pcm_frame_features_matches_python_twin(spark, samples, win_ms):
    """Framing, energy and zero-crossings equal an independent python
    twin for arbitrary PCM and window sizes (sample_rate 1000 → win =
    hop = win_ms samples)."""
    from peskas_mozambique_data_pipeline_spark.operators.multimodal import (
        pcm_frame_features,
    )

    df = spark.createDataFrame([(1, samples)], "asset_id long, samples array<long>")
    out = pcm_frame_features(
        df, window_ms=win_ms, hop_ms=win_ms, sample_rate=1000
    )
    got = sorted(
        (r.win_start_ms, r.n_samples, r.energy, r.zero_crossings)
        for r in out.collect()
    )
    win = win_ms  # 1000 Hz → win_ms samples per window
    n = len(samples)
    frames = (
        [samples[i * win : i * win + win] for i in range((n - win) // win + 1)]
        if n >= win
        else [samples]
    )
    want = []
    for i, sl in enumerate(frames):
        e = sum(x * x for x in sl)
        z = sum(1 for k in range(len(sl) - 1) if (sl[k] < 0) != (sl[k + 1] < 0))
        want.append((i * win * 1000 // 1000, len(sl), e, z))
    assert got == sorted(want)


@SET
@given(
    st.lists(st.integers(min_value=-(2**15), max_value=2**15 - 1),
             min_size=1, max_size=120),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=8),
)
@pytest.mark.slow
def test_audio_fingerprint_matches_python_twin(spark, samples, win_ms, bpw):
    """Delta-sign bit packing equals an independent python twin for
    arbitrary PCM, window sizes and word widths (sample_rate 1000 →
    win = hop = win_ms samples), including the no-bits single-frame
    case and trailing partial words."""
    from peskas_mozambique_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
    )

    df = spark.createDataFrame([(1, samples)], "asset_id long, samples array<long>")
    out = audio_fingerprint(
        df, window_ms=win_ms, hop_ms=win_ms, sample_rate=1000,
        bits_per_word=bpw,
    )
    got = {(r.word_idx, r.fp) for r in out.collect()}

    win = win_ms
    n = len(samples)
    frames = (
        [samples[i * win : i * win + win] for i in range((n - win) // win + 1)]
        if n >= win
        else [samples]
    )
    energies = [sum(x * x for x in sl) for sl in frames]
    bits = [
        1 if energies[i + 1] > energies[i] else 0
        for i in range(len(energies) - 1)
    ]
    words: dict[int, int] = {}
    for seq, b in enumerate(bits):
        words[seq // bpw] = words.get(seq // bpw, 0) | (b << (seq % bpw))
    assert got == set(words.items())


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    st.sampled_from([4, 16, 64]),
)
@pytest.mark.slow
def test_kmv_merge_semilattice_property(spark, xs, ys, k):
    """sketch(A ∪ B) == merge(sketch A, sketch B) exactly, for random
    multisets and any k — the property that makes shard-parallel
    sketching error-free."""
    from peskas_mozambique_data_pipeline_spark.operators import sketches as sk

    a = spark.createDataFrame([(f"v{x}",) for x in xs], "v string")
    b = spark.createDataFrame([(f"v{y}",) for y in ys], "v string")
    whole = sk.kmv_sketch(a.union(b), "v", k=k).first().kmv
    parts = sk.kmv_merge(
        sk.kmv_sketch(a, "v", k=k).union(sk.kmv_sketch(b, "v", k=k)), k=k
    ).first().kmv
    assert whole == parts


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=3,
        max_size=8,
        unique=True,
    ),
    st.lists(
        st.tuples(
            st.floats(min_value=-12, max_value=12, allow_nan=False),
            st.floats(min_value=-12, max_value=12, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_point_in_polygon_matches_python_twin(spark, verts, pts):
    """The HOF ray cast decides exactly like a scalar python twin of
    the same algorithm for arbitrary (angle-sorted, so simple)
    polygons and points."""
    import math

    from peskas_mozambique_data_pipeline_spark.operators import geo

    cx = sum(x for x, _ in verts) / len(verts)
    cy = sum(y for _, y in verts) / len(verts)
    ring = sorted(verts, key=lambda p: math.atan2(p[1] - cy, p[0] - cx))

    def twin(px, py):
        n = len(ring)
        c = 0
        for i in range(n):
            xa, ya = ring[i]
            xb, yb = ring[(i + 1) % n]
            if (ya > py) != (yb > py) and px < (xb - xa) * (py - ya) / (yb - ya) + xa:
                c += 1
        return c % 2 == 1

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    )
    ring_lit = F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in ring
        ]
    )
    got = {
        r.pid: r.inside
        for r in df.select(
            "pid",
            geo.point_in_polygon(F.col("x"), F.col("y"), ring_lit).alias("inside"),
        ).collect()
    }
    want = {i: twin(float(x), float(y)) for i, (x, y) in enumerate(pts)}
    assert got == want


# ---------------------------------------------------------------------------
# Main-content extraction ≡ python twin (the ray-cast twin discipline
# applied to the r12 block filter): arbitrary well-formed block soups
# must classify exactly like a scalar re-based replay of the same
# strip/split/decode/normalize/threshold chain.

_TWIN_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|table|br|hr|blockquote"
    r"|pre|section|article|aside|nav|header|footer|form|figure|figcaption"
    r"|title|option|select|textarea)\b[^>]*>"
)


def _twin_ws(s):
    import re

    s = re.sub(r"[ \t\r\f]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n+", "\n", s)
    return re.sub(r"[\s]+$", "", re.sub(r"^[\s]+", "", s))


def _twin_main(page, min_chars, max_ld):
    import re

    h = re.sub(r"(?s)<!--.*?-->", "", page)
    h = re.sub(r"(?is)<script\b[^>]*>.*?</script>", "", h)
    h = re.sub(r"(?is)<style\b[^>]*>.*?</style>", "", h)
    kept = []
    for frag in re.split(_TWIN_BLOCK_SPLIT, h):
        text = _twin_ws(re.sub(r"(?s)<[^>]*>", " ", frag))
        if not text:
            continue
        inner = "\n".join(re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", frag))
        link_chars = len(_twin_ws(re.sub(r"(?s)<[^>]*>", " ", inner)))
        if len(text) >= min_chars and link_chars <= len(text) * max_ld:
            kept.append(text)
    return "\n".join(kept)


_words = st.text(alphabet="abcdef gh", min_size=1, max_size=40)


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from(["prose", "linky", "junk"]), _words, _words),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow
def test_extract_main_content_matches_python_twin(spark, blocks):
    from peskas_mozambique_data_pipeline_spark.operators import html as H

    parts = []
    for kind, a, b in blocks:
        if kind == "prose":
            parts.append(f'<p>{a} <a href="/x">{b}</a> tail</p>')
        elif kind == "linky":
            parts.append(f'<li><a href="/y">{a}</a></li>')
        else:
            parts.append(f"<div>{a}</div>")
    page = "<html><body>" + "".join(parts) + "</body></html>"
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    got = H.extract_main_content(
        df, min_chars=8, max_link_density=0.5
    ).first().main_text
    assert got == _twin_main(page, 8, 0.5)


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=50),
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=50),
)
@pytest.mark.slow
def test_bloom_merge_semilattice_property(spark, xs, ys):
    """pack(bits(A ∪ B)) == merge(pack(bits A), pack(bits B)) bit for
    bit, for random multisets — OR is the semilattice that makes
    shard-parallel and incremental filter builds error-free."""
    from peskas_mozambique_data_pipeline_spark.operators import sketches as sk

    a = spark.createDataFrame([(f"v{x}",) for x in xs], "v string")
    b = spark.createDataFrame([(f"v{y}",) for y in ys], "v string")
    whole = sk.bloom_pack(sk.bloom_bits(a.union(b), "v")).first().bloom
    parts = sk.bloom_merge(
        sk.bloom_pack(sk.bloom_bits(a, "v")).unionByName(
            sk.bloom_pack(sk.bloom_bits(b, "v"))
        )
    ).first().bloom
    assert list(whole) == list(parts)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([2, 4, 8]),
)
@pytest.mark.slow
def test_zorder_key_matches_python_twin_property(spark, pts, bits):
    """Morton keys equal a pure-python twin for random (x, y) incl.
    huge magnitudes — the DIV (integer division) exactness claim."""
    from peskas_mozambique_data_pipeline_spark.operators import layout

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.zkey
        for r in layout.zorder_key(df, ["x", "y"], bits=bits).collect()
    }
    lox, hix = min(x for x, _ in pts), max(x for x, _ in pts)
    loy, hiy = min(y for _, y in pts), max(y for _, y in pts)
    want = {}
    for i, (x, y) in enumerate(pts):
        bx = (x - lox) * (1 << bits) // (hix - lox + 1)
        by = (y - loy) * (1 << bits) // (hiy - loy + 1)
        key = 0
        for j in range(bits):
            key += ((bx >> j) & 1) << (2 * j)
            key += ((by >> j) & 1) << (2 * j + 1)
        want[i] = key
    assert got == want


@SET
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**50),
        min_size=1,
        max_size=60,
    )
)
def test_hdr_buckets_match_python_twin_property(spark, vals):
    """HDR bucket ids and lower bounds equal a pure-python twin for
    random magnitudes spanning 50 octaves — the length(bin)/shift
    integer contract."""
    from peskas_mozambique_data_pipeline_spark.operators import sketches as sk

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        (r.bucket, r.lo): r.n
        for r in sk.hdr_histogram(df, "v").collect()
    }
    sb = sk.HDR_SUB_BITS
    want = {}
    for v in vals:
        if v == 0:
            key = (0, 0)
        else:
            m = v.bit_length()
            s = max(0, m - 1 - sb)
            key = (m * (1 << (sb + 1)) + (v >> s), (v >> s) << s)
        want[key] = want.get(key, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# CDC apply: random upsert/delete interleavings vs a python-dict twin
# (VERDICT r13 Next #6 — the discipline used for the other ledgers)

_cdc_change = st.tuples(
    st.integers(min_value=0, max_value=5),    # key
    st.integers(min_value=0, max_value=20),   # seq
    st.sampled_from(["upsert", "delete"]),
    st.integers(min_value=0, max_value=100),  # payload
)


def _unique_key_seq(batch):
    seen, out = set(), []
    for k, seq, op, v in batch:
        if (k, seq) not in seen:
            seen.add((k, seq))
            out.append((k, seq, op, v))
    return out


@SET
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=100),
        max_size=4,
    ),
    st.lists(
        st.lists(_cdc_change, min_size=1, max_size=8).map(_unique_key_seq),
        min_size=1,
        max_size=3,
    ),
)
@pytest.mark.slow
def test_apply_cdc_matches_python_dict_twin(spark, target_in, batches):
    """Batch-by-batch application of random upsert/delete interleavings
    (keys colliding across batches, seqs in any order, deletes of
    absent keys) matches the dict twin of the contract: per batch the
    highest-seq change per key wins, upsert winners replace/insert,
    delete winners remove, untouched keys survive verbatim."""
    from peskas_mozambique_data_pipeline_spark.operators.merge import (
        apply_cdc,
    )

    state = dict(target_in)
    for batch in batches:
        tgt = spark.createDataFrame(
            [(k, v) for k, v in sorted(state.items())] or [],
            "k long, v long",
        )
        ch = spark.createDataFrame(batch, "k long, seq long, op string, v long")
        got = {
            r.k: r.v for r in apply_cdc(tgt, ch, ["k"]).collect()
        }
        latest = {}
        for k, seq, op, v in batch:
            if k not in latest or seq > latest[k][0]:
                latest[k] = (seq, op, v)
        for k, (_seq, op, v) in latest.items():
            if op == "upsert":
                state[k] = v
            else:
                state.pop(k, None)
        assert got == state, (batch, got, state)


@SET
@given(st.lists(_cdc_change, min_size=1, max_size=6).map(_unique_key_seq))
@pytest.mark.slow
def test_apply_cdc_duplicate_key_seq_always_raises(spark, batch):
    """The strict guard fires on ANY batch containing a duplicated
    (key, seq) pair, regardless of the surrounding interleaving."""
    import pytest as _pytest

    from peskas_mozambique_data_pipeline_spark.operators.merge import (
        apply_cdc,
    )

    k0, s0, _op, v0 = batch[0]
    poisoned = batch + [(k0, s0, "upsert", v0 + 1)]
    tgt = spark.createDataFrame([(99, 1)], "k long, v long")
    ch = spark.createDataFrame(poisoned, "k long, seq long, op string, v long")
    with _pytest.raises(Exception, match="duplicate"):
        apply_cdc(tgt, ch, ["k"]).collect()
