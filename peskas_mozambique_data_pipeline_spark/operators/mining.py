"""Retrieval-training-data mining: batch multi-query BM25 and hard
negatives.

Embedding/reranker training wants, for EVERY training query, the
top-k corpus documents that score high under a lexical retriever but
are NOT labeled positives — "hard negatives" (Karpukhin et al. 2020,
DPR).  The single-query tiers (``text.bm25_topk_indexed``, the
persistent-index tier) would re-plan per query — a driver loop, the
anti-pattern — so this module scores ALL queries in one job:

1. one corpus scan explodes postings, semi-filtered on the UNION of
   all query vocabularies (broadcast; vocab-bounded, not
   corpus-bounded) BEFORE the tf groupBy, so only matching postings
   shuffle;
2. per-term document frequencies come from the matched postings
   (groupBy + broadcast join-back — never a window over the corpus);
3. scoring joins postings to the (query_id, term, multiplicity) frame
   and sums NANO-UNIT integer contributions per (query, doc) —
   the same floored float expression as ``text.score_bm25_postings``
   on the same operands, so a single query through this tier is
   BIT-equal to ``bm25_topk_indexed`` (cross-tier parity pytest, the
   bpe fast/slow pattern);
4. ranking is a per-query window (parallel across queries — one query
   never funnels the job), positives drop via one anti-join, and an
   optional ``skip_top`` discards the best-ranked survivors (the
   standard hedge against unlabeled positives hiding in the top).

Scale shape: cost ∝ matched postings × queries sharing each term,
independent of query COUNT in plan size (queries are data, not plan);
the corpus is scanned once (the matched-postings frame is
localCheckpoint-ed because document frequencies and scoring both
consume it — the materialization rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .text import tokens


def _query_terms(
    queries: DataFrame, query_id_col: str, query_text_col: str
) -> DataFrame:
    """(query_id, term, _mult): each query's token multiset."""
    return (
        queries.select(
            F.col(query_id_col),
            F.explode(tokens(query_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(query_id_col, "term")
        .agg(F.count(F.lit(1)).alias("_mult"))
    )


def bm25_scores_multi(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-``k`` BM25 results for EVERY query in one job:
    (query_id, doc_id, n_terms_hit, score, rank).

    Bit-parity contract: a single query through this tier equals
    ``text.bm25_topk_indexed`` row-for-row (same nano-floored
    contribution expression, same order-free BIGINT sum, same
    (score DESC, doc_id) order) — pinned by pytest."""
    qterms = _query_terms(queries, query_id_col, query_text_col)
    vocab = qterms.select("term").distinct()
    toks = tokens(text_col)
    base = corpus.select(F.col(id_col), F.size(toks).alias("_dl"))
    stats = base.agg(
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    # matched postings feed TWO consumers (document frequencies and
    # scoring) — materialize once; the frame is vocab × docs bounded
    postings = (
        corpus.select(
            F.col(id_col),
            F.size(toks).alias("_dl"),
            F.explode(toks).alias("term"),
        )
        .join(F.broadcast(vocab), "term")
        .groupBy(id_col, "term", "_dl")
        .agg(F.count(F.lit(1)).alias("_tf"))
    ).localCheckpoint()
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    tf = F.col("_tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    part = (
        tf
        * F.lit(k1 + 1.0)
        / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
    )
    contrib = F.floor(idf * part * F.lit(1e9)).cast("long") * F.col("_mult")
    per_pair = (
        scored.select(
            F.col(query_id_col), F.col(id_col), F.col("_mult"),
            contrib.alias("_cq"),
        )
        .groupBy(query_id_col, id_col)
        .agg(
            F.sum("_mult").alias("n_terms_hit"),
            F.round(F.sum("_cq") / F.lit(1e9), 6).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return per_pair.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    skip_top: int = 0,
    pool_depth: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Per query: the ``k`` highest-BM25 documents that are NOT labeled
    positives, skipping the ``skip_top`` best-ranked survivors first
    (likely unlabeled positives).  Output: (query_id, doc_id,
    n_terms_hit, score, neg_rank 1..k).

    ``positives`` is (query_id, doc_id) and drops via ONE left-anti
    join BEFORE ranking, so excluded docs never occupy rank slots.
    The candidate pool scores ``pool_depth`` deep per query (default
    ``k + skip_top + 10`` — headroom for positives that would have
    ranked inside the window; raise it when queries carry many labeled
    positives)."""
    depth = pool_depth if pool_depth is not None else k + skip_top + 10
    pool = bm25_scores_multi(
        corpus,
        queries,
        k=depth,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).drop("rank")
    pool = pool.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else pool
    pos_std = positives.select(
        F.col(query_id_col), F.col(id_col).alias("doc_id")
    )
    return _rank_negatives(
        pool, pos_std, k, skip_top, query_id_col, "doc_id", "score"
    ).withColumnRenamed("doc_id", id_col)


def mine_hard_negatives_dense(
    query_vecs: DataFrame,
    corpus_vecs: DataFrame,
    positives: DataFrame,
    k: int = 10,
    skip_top: int = 0,
    pool_depth: int | None = None,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense-retriever hard negatives: per query, the ``k``
    highest-COSINE corpus vectors that are not labeled positives,
    after ``skip_top`` — the embedding-space twin of
    :func:`mine_hard_negatives` (mining negatives under the CURRENT
    encoder is the standard iteration loop for dual-encoder training).

    Rides the verified brute-force tier
    (``similarity.cosine_topk``: queries broadcast, corpus never
    shuffles, per-query windows); same DPR discipline — pool
    ``pool_depth`` deep (default ``k + skip_top + 10``), positives
    drop via ONE left-anti join BEFORE ranking.  Output: (query_id,
    doc_id, cosine_sim, neg_rank 1..k)."""
    from .similarity import cosine_topk

    depth = pool_depth if pool_depth is not None else k + skip_top + 10
    pool = cosine_topk(
        query_vecs,
        corpus_vecs,
        k=depth,
        query_id=query_id_col,
        corpus_id=corpus_id_col,
        vec_col=vec_col,
    ).drop("rank")
    out = _rank_negatives(
        pool, positives, k, skip_top, query_id_col, "neighbor_id",
        "cosine_sim",
    )
    return out.select(
        F.col(query_id_col),
        F.col("neighbor_id").alias("doc_id"),
        "cosine_sim",
        "neg_rank",
    )


def _rank_negatives(
    pool: DataFrame,
    positives: DataFrame,
    k: int,
    skip_top: int,
    query_id_col: str,
    doc_id_col: str,
    order_col: str,
) -> DataFrame:
    """Shared DPR tail: ONE left-anti join drops labeled positives
    BEFORE ranking (a positive never occupies a negative's slot), then
    a per-query window ranks by (``order_col`` DESC, doc id) and the
    ``skip_top`` best survivors are shed."""
    neg = pool.join(
        positives.select(
            F.col(query_id_col), F.col("doc_id").alias(doc_id_col)
        ),
        [query_id_col, doc_id_col],
        "left_anti",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(order_col).desc(), F.col(doc_id_col).asc()
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(
            (F.col("neg_rank") > skip_top)
            & (F.col("neg_rank") <= skip_top + k)
        )
        .withColumn("neg_rank", F.col("neg_rank") - F.lit(skip_top))
    )


def mine_hard_negatives_ivf(
    spark,
    zones,
    query_vecs: DataFrame,
    positives: DataFrame,
    k: int = 10,
    skip_top: int = 0,
    pool_depth: int | None = None,
    n_probe: int = 2,
    prefix: str = "ann_ivf",
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense hard negatives against the PERSISTENT IVF index zone —
    the scale tier past :func:`mine_hard_negatives_dense`'s brute
    force (queries × corpus).  Routing reads only the probed inverted
    lists (partition-pruned parquet), so mining cost tracks probed
    postings, not corpus size; recall follows the index's measured
    n_probe dial (``ann_sweep``).  Same DPR tail as the exact tier.
    Output: (query_id, doc_id, cosine_sim, neg_rank 1..k)."""
    from .ann_index import ivf_topk_from_zone

    depth = pool_depth if pool_depth is not None else k + skip_top + 10
    pool = ivf_topk_from_zone(
        spark,
        zones,
        query_vecs,
        prefix=prefix,
        k=depth,
        n_probe=n_probe,
        query_id=query_id_col,
        corpus_id=corpus_id_col,
        vec_col=vec_col,
    ).drop("rank")
    out = _rank_negatives(
        pool, positives, k, skip_top, query_id_col, "neighbor_id",
        "cosine_sim",
    )
    return out.select(
        F.col(query_id_col),
        F.col("neighbor_id").alias("doc_id"),
        "cosine_sim",
        "neg_rank",
    )
