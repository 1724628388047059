"""Batch multi-query BM25 + hard-negative mining: cross-tier bit
parity with the single-query indexed tier, positive exclusion,
skip_top semantics, one-corpus-scan plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import mining
from peskas_mozambique_data_pipeline_spark.operators import text as tx


def _corpus(spark):
    rows = [
        (1, "spark shuffles data between stages"),
        (2, "bloom filters answer membership questions"),
        (3, "spark broadcast joins avoid shuffles"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "bm25 ranks documents by term saturation"),
        (6, "data layout and z order clustering prune scans"),
        (7, "spark spark spark tuning guide"),
        (8, "membership sketches and bloom filters at scale"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_query_matches_indexed_tier_bit_for_bit(spark):
    corpus = _corpus(spark)
    q = "spark shuffles"
    want = {
        (r.doc_id, r.n_terms_hit, r.score)
        for r in tx.bm25_topk_indexed(corpus, q.split(), k=5).collect()
    }
    queries = spark.createDataFrame(
        [(100, q)], "query_id long, query_text string"
    )
    got = {
        (r.doc_id, r.n_terms_hit, r.score)
        for r in mining.bm25_scores_multi(corpus, queries, k=5).collect()
    }
    assert got == want and len(got) > 1


def test_multi_query_ranks_are_per_query(spark):
    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "spark shuffles"), (2, "bloom filters membership")],
        "query_id long, query_text string",
    )
    out = mining.bm25_scores_multi(corpus, queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2}
    for rows in by_q.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
    # each query's winner reflects its own terms
    best = {q: [r.doc_id for r in rows if r.rank == 1][0] for q, rows in by_q.items()}
    assert best[1] in (1, 3, 7) and best[2] in (2, 8)


def test_hard_negatives_exclude_positives_and_skip_top(spark):
    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "spark shuffles")], "query_id long, query_text string"
    )
    top = mining.bm25_scores_multi(corpus, queries, k=4).orderBy("rank").collect()
    pos_doc = top[0].doc_id
    positives = spark.createDataFrame(
        [(1, pos_doc)], "query_id long, doc_id long"
    )
    neg = mining.mine_hard_negatives(
        corpus, queries, positives, k=3
    ).orderBy("neg_rank").collect()
    ids = [r.doc_id for r in neg]
    assert pos_doc not in ids
    # the positive's slot is filled: negatives are the next-best docs
    # (only docs 1, 3, 7 match "spark shuffles" -> 2 negatives exist)
    assert ids == [r.doc_id for r in top[1:3]]
    assert [r.neg_rank for r in neg] == [1, 2]
    skipped = mining.mine_hard_negatives(
        corpus, queries, positives, k=2, skip_top=1
    ).orderBy("neg_rank").collect()
    assert [r.doc_id for r in skipped] == ids[1:]
    assert [r.neg_rank for r in skipped] == [1]


def test_multi_query_plan_scans_corpus_once_for_postings(spark):
    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [(i, f"spark data q{i}") for i in range(20)],
        "query_id long, query_text string",
    )
    df = mining.bm25_scores_multi(corpus, queries, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # postings are localCheckpoint-ed: document frequencies and
    # scoring reuse the materialized frame, not fresh corpus scans
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert df.count() > 0


import pytest as _pytest


@_pytest.mark.parametrize(
    "src",
    [
        "/root/testdata/sf0.001/documents.parquet",
        "/root/testdata/sf0.01/documents.parquet",
    ],
)
def test_hard_negatives_duckdb_parity(spark, src):
    """Staged-row-grade evidence (no registry slot): three queries'
    hard negatives over the documents table replay bit-exactly in
    DuckDB at BOTH evidence scale factors — per-query tf/df/saturation with the SAME nano-floored
    contribution as the hash-verified bm25 oracle, analytic positives
    (doc_id % 13 = 0), anti-join before ranking, skip_top replayed as
    a rank offset."""
    import os

    import duckdb
    import pytest

    if not os.path.exists(src):
        pytest.skip("driver testdata not present")
    corpus = spark.read.parquet(src).select("doc_id", "text")
    qdefs = {
        1: ("spark", "window"),
        2: ("merge", "join"),
        3: ("stream", "state", "spark"),
    }
    queries = spark.createDataFrame(
        [(qid, " ".join(ts)) for qid, ts in qdefs.items()],
        "query_id long, query_text string",
    )
    positives = (
        corpus.filter(F.col("doc_id") % 13 == 0)
        .crossJoin(queries.select("query_id"))
        .select("query_id", "doc_id")
    )
    got = sorted(
        (r.query_id, r.doc_id, r.n_terms_hit, r.score, r.neg_rank)
        for r in mining.mine_hard_negatives(
            corpus, queries, positives, k=8, skip_top=2, pool_depth=200
        ).collect()
    )

    tok = r"string_split_regex(trim(text), '\s+')"
    k1, b = 1.2, 0.75
    legs = []
    for qid, terms in qdefs.items():
        tf_defs = ", ".join(
            f"len(list_filter({tok}, x -> x = '{t}')) AS tf{i}"
            for i, t in enumerate(terms)
        )
        df_defs = ", ".join(
            f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
            for i in range(len(terms))
        )
        hit_sum = " + ".join(
            f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
            for i in range(len(terms))
        )
        contrib = " + ".join(
            f"(CASE WHEN tf{i} > 0 THEN CAST(FLOOR("
            f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
            f" * (tf{i} * {k1 + 1.0!r} / (tf{i} + {k1!r} * ({1.0 - b!r}"
            f" + {b!r} * dl / avgdl))) * 1000000000.0) AS BIGINT) ELSE 0 END)"
            for i in range(len(terms))
        )
        legs.append(f"""
          SELECT {qid} AS query_id, doc_id, {hit_sum} AS n_terms_hit,
                 {contrib} AS sq
          FROM (SELECT doc_id, len({tok}) AS dl, {tf_defs}
                FROM read_parquet('{src}')) base,
               (SELECT SUM(dl) / COUNT(*) AS avgdl,
                       CAST(COUNT(*) AS DOUBLE) AS n, {df_defs}
                FROM (SELECT len({tok}) AS dl, {tf_defs}
                      FROM read_parquet('{src}'))) stats
        """)
    union = " UNION ALL ".join(legs)
    sql = f"""
    WITH scored AS ({union}),
    pool AS (
      SELECT query_id, doc_id, n_terms_hit,
             ROUND(CAST(sq AS DOUBLE) / 1000000000.0, 6) AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sq DESC, doc_id ASC) AS rk
      FROM scored WHERE n_terms_hit > 0
    ),
    deep AS (SELECT * FROM pool WHERE rk <= 200),
    neg AS (
      SELECT query_id, doc_id, n_terms_hit, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS nr
      FROM deep WHERE doc_id % 13 <> 0
    )
    SELECT query_id, doc_id, n_terms_hit, score, nr - 2 AS neg_rank
    FROM neg WHERE nr > 2 AND nr <= 10
    """
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    want = sorted((q, d, int(h), s, int(nr)) for q, d, h, s, nr in rows)
    assert got == want
    assert len(got) == 24  # 3 queries x 8 negatives, all slots filled


def test_dense_hard_negatives_exclude_positives(spark):
    import math

    def vec(angle):
        return [math.cos(angle), math.sin(angle)]

    corpus = spark.createDataFrame(
        [(i, vec(i * 0.1)) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, vec(0.05))], "query_id long, embedding array<double>"
    )
    # nearest corpus vecs to angle 0.05 are ids 0 and 1 (0.0, 0.1)
    positives = spark.createDataFrame(
        [(100, 0)], "query_id long, doc_id long"
    )
    out = mining.mine_hard_negatives_dense(
        corpus_vecs=corpus, query_vecs=queries, positives=positives, k=3
    ).orderBy("neg_rank").collect()
    ids = [r.doc_id for r in out]
    assert 0 not in ids
    assert ids[0] == 1  # the other near-neighbor leads the negatives
    assert [r.neg_rank for r in out] == [1, 2, 3]
    sims = [r.cosine_sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_ivf_hard_negatives_match_exact_tier_on_probed_pool(spark, tmp_path):
    """The IVF miner applies the SAME DPR tail to the index tier's
    pool: its negatives equal ranking ivf_topk_from_zone's pool by
    hand, and labeled positives never appear."""
    import os

    import pytest

    src = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata not present")
    from peskas_mozambique_data_pipeline_spark.operators import (
        ann_index,
        similarity as sim_ops,
    )
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    emb = spark.read.parquet(src).select("vec_id", "embedding")
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(
        emb, n_centroids=4, n_iters=2
    )
    ann_index.save_ivf_index(zones, assignments, centroids)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pool = ann_index.ivf_topk_from_zone(
        spark, zones, queries, k=13, n_probe=2
    ).collect()
    # positives: each query's single nearest pool neighbor
    pos = [
        (r.query_id, r.neighbor_id) for r in pool if r.rank == 1
    ]
    positives = spark.createDataFrame(pos, "query_id long, doc_id long")
    got = mining.mine_hard_negatives_ivf(
        spark, zones, queries, positives, k=3, n_probe=2
    ).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.neg_rank)):
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    want = {}
    for r in sorted(pool, key=lambda r: (r.query_id, r.rank)):
        if (r.query_id, r.neighbor_id) in set(pos):
            continue
        want.setdefault(r.query_id, [])
        if len(want[r.query_id]) < 3:
            want[r.query_id].append(r.neighbor_id)
    assert by_q == want
    banned = set(pos)
    assert all((r.query_id, r.doc_id) not in banned for r in got)


@pytest.mark.slow
def test_export_training_triples_roundtrip(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.io import parquet_io
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )
    from peskas_mozambique_data_pipeline_spark.plans.retrieval import (
        export_training_triples,
    )

    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "spark shuffles"), (2, "bloom filters membership")],
        "query_id long, query_text string",
    )
    positives = spark.createDataFrame(
        [(1, 1), (2, 2)], "query_id long, doc_id long"
    )
    df = export_training_triples(corpus, queries, positives, k_neg=2)
    rows = {r.query_id: r for r in df.collect()}
    assert set(rows) == {1, 2}
    for qid, r in rows.items():
        assert r.pos_id in (1, 2)
        assert r.pos_id not in r.neg_ids  # positive never a negative
        assert 0 < len(r.neg_ids) <= 2
    # ordered by mined rank: the strongest negative leads
    neg = mining.mine_hard_negatives(
        corpus, queries, positives, k=2
    ).collect()
    want1 = [
        r.doc_id
        for r in sorted(
            (x for x in neg if x.query_id == 1), key=lambda x: x.neg_rank
        )
    ]
    assert list(rows[1].neg_ids) == want1
    # zone write path: versioned snapshot lands and reads back
    zones = PipelineZones(str(tmp_path))
    path = export_training_triples(
        corpus, queries, positives, zones=zones, k_neg=2
    )
    back = parquet_io.read_latest(spark, str(tmp_path), "triples")
    assert back.count() == 2 and "neg_ids" in back.columns


def test_export_training_triples_string_ids_empty_negatives(spark):
    from peskas_mozambique_data_pipeline_spark.plans.retrieval import (
        export_training_triples,
    )

    # one-doc corpus where the only doc is the labeled positive: the
    # mined negative set is empty, and with a STRING id column the
    # fallback must coalesce to array<string>, not a widened
    # array<long> literal
    corpus = spark.createDataFrame(
        [("d1", "spark shuffle join broadcast")], "doc_id string, text string"
    )
    queries = spark.createDataFrame(
        [(1, "spark shuffle")], "query_id long, query_text string"
    )
    positives = spark.createDataFrame(
        [(1, "d1")], "query_id long, doc_id string"
    )
    df = export_training_triples(corpus, queries, positives, k_neg=2)
    assert df.schema["neg_ids"].dataType.simpleString() == "array<string>"
    r = df.first()
    assert r.pos_id == "d1" and list(r.neg_ids) == []
