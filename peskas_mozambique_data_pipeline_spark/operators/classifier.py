"""Hashed linear text classifier — the fastText-shaped quality scorer
large corpus pipelines run over every document (e.g. the "looks like a
reference page" classifiers used to curate web crawls).

Two halves, both pure DataFrame ops:

* :func:`fit_hashed_nb` — closed-form Naive-Bayes log-odds training
  over hashed bag-of-words features.  Counts are exact integers from
  one groupBy; the only floats are the final per-feature log-odds,
  which are nano-quantized to BIGINT so the fitted model is a plain
  (feature, w_nano) table with deterministic values.
* :func:`score_hashed_linear` — inference: explode tokens, hash into
  the feature space, broadcast-join the weight table, sum weights per
  document as exact BIGINTs (order-free), then one division and a
  sigmoid.

Scale shape: training shuffles (label, feature) count pairs — bounded
by ``dim``, not the corpus; inference broadcasts the model (a 2^18
feature table is ~4 MB) and aggregates per document on the id key, so
the corpus is read once and shuffles only (id, partial-sum) pairs.
Feature hashing (Weinberger et al., ICML'09) keeps the model fixed-size
regardless of vocabulary growth — the property that matters at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import bpe_ish_tokens

NANO = 1_000_000_000


def hashed_feature(
    token: Column, dim: int, method: str = "xxhash64"
) -> Column:
    """Stable token → [0, dim) feature id.

    ``xxhash64`` (default): fastest JVM path, folded by pmod so the id
    is non-negative even for negative hashes.  ``md5``: first 8 hex
    digits → BIGINT mod dim — ~2× slower but engine-portable (DuckDB,
    Python hashlib produce the identical id), which is what the oracle
    row and any cross-engine model exchange need.  Both are uniform;
    models are NOT interchangeable across methods (the feature space
    permutes), so fit and score must agree on one.
    """
    if method == "xxhash64":
        return F.pmod(F.xxhash64(token), F.lit(dim)).cast("long")
    if method == "md5":
        return (
            F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
            % F.lit(dim)
        ).cast("long")
    raise ValueError(f"unknown feature hash method: {method!r}")


def _doc_features(
    df: DataFrame, text_col: str, id_col: str, dim: int,
    feature_hash: str = "xxhash64",
) -> DataFrame:
    """(id, feature, n) token-multiplicity triples — the shared explode
    both halves consume."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(bpe_ish_tokens(text_col)).alias("_tok"),
    ).filter(F.col("_tok") != "")
    return (
        toks.select(
            "_id", hashed_feature(F.col("_tok"), dim, feature_hash).alias("feature")
        )
        .groupBy("_id", "feature")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fit_hashed_nb(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 2**18,
    alpha: float = 1.0,
    feature_hash: str = "xxhash64",
) -> tuple[DataFrame, int]:
    """Closed-form multinomial Naive-Bayes in log-odds form over hashed
    features.  ``label_col`` must be 0/1 (1 = positive class).

    Per feature f:  w(f) = ln((c1+α)/(T1+α·dim)) − ln((c0+α)/(T0+α·dim))
    with cℓ the token-occurrence count of f under label ℓ and Tℓ the
    label's total token count.  The bias is the class log-prior ratio.
    Returns ``(weights, bias_nano)`` where ``weights`` is a
    (feature BIGINT, w_nano BIGINT) table and ``bias_nano`` an int —
    the model is fully described by integers, so a fitted model
    round-trips through parquet without float drift.

    The class totals and priors are two tiny aggregate rows collected
    driver-side (the model-coefficient pattern — bounded by the label
    count, never the corpus).
    """
    # token-occurrence counts need only (label, feature) grain — no doc
    # id, so multiplicities collapse straight onto the label
    lab = df.select(
        F.col(label_col).cast("int").alias("_y"),
        F.explode(bpe_ish_tokens(text_col)).alias("_tok"),
    ).filter(F.col("_tok") != "")
    counts = (
        lab.select(
            "_y", hashed_feature(F.col("_tok"), dim, feature_hash).alias("feature")
        )
        .groupBy("feature")
        .agg(
            F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).alias("c0"),
        )
    )
    totals = lab.agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("t1"),
        F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).alias("t0"),
    ).first()
    t1, t0 = int(totals["t1"]), int(totals["t0"])
    n_docs = df.groupBy().agg(
        F.sum(F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)).alias(
            "d1"
        ),
        F.count(F.lit(1)).alias("d"),
    ).first()
    d1, d = int(n_docs["d1"]), int(n_docs["d"])
    if d1 == 0 or d1 == d:
        raise ValueError("fit_hashed_nb needs both classes present")
    bias_nano = round(
        (math.log((d1 + alpha) / (d - d1 + alpha))) * NANO
    )
    denom1 = float(t1) + alpha * dim
    denom0 = float(t0) + alpha * dim
    w = (
        F.log((F.col("c1") + F.lit(alpha)) / F.lit(denom1))
        - F.log((F.col("c0") + F.lit(alpha)) / F.lit(denom0))
    )
    weights = counts.select(
        "feature", F.round(w * NANO).cast("long").alias("w_nano")
    )
    return weights, bias_nano


def score_hashed_linear(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 2**18,
    bias_nano: int = 0,
    feature_hash: str = "xxhash64",
) -> DataFrame:
    """Score every document under a (feature, w_nano) linear model:
    ``score = bias + Σ_tokens w(feature(token))``, plus the sigmoid
    ``prob``.  Weight sums are exact BIGINT folds (order-free, so the
    score is bit-deterministic under any shuffle ordering); the only
    floats are the final /1e9 and the sigmoid.

    Unseen features score 0 (left join + coalesce), and documents with
    no tokens keep a bias-only score rather than dropping out.
    """
    feats = _doc_features(df, text_col, id_col, dim, feature_hash)
    hit = feats.join(F.broadcast(weights), "feature").groupBy("_id").agg(
        F.sum(F.col("n") * F.col("w_nano")).alias("_sum_nano")
    )
    score_nano = F.coalesce(F.col("_sum_nano"), F.lit(0)) + F.lit(bias_nano)
    out = df.join(
        hit.select(F.col("_id").alias(id_col), "_sum_nano"), id_col, "left"
    )
    score = (score_nano.cast("double") / NANO).alias("score")
    return out.select(
        "*",
        score,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score_nano.cast("double") / NANO))).alias(
            "prob"
        ),
    ).drop("_sum_nano")


def score_hashed_linear_map(
    df: DataFrame,
    weights: dict[int, int],
    text_col: str = "text",
    dim: int = 2**18,
    bias_nano: int = 0,
    feature_hash: str = "xxhash64",
) -> DataFrame:
    """Shuffle-FREE scoring tier: the model rides into the plan as a
    map literal and every document folds its own token array —
    ``score = bias + aggregate(tokens, w[feature(token)])`` — entirely
    inside the scan stage.  No explode, no join, no groupBy; works
    UNCHANGED on a streaming DataFrame because it is stateless (the
    join tier's per-doc aggregate is a stateful shuffle in a stream).

    The trade: the weight map is serialized into the plan/codegen, so
    this tier is for compact models (<= ~64k populated features —
    distilled or pruned scorers).  Bigger models use
    :func:`score_hashed_linear`'s broadcast join.  Same exact BIGINT
    arithmetic as the join tier: for identical weights the two tiers
    agree bit-for-bit (pytest-pinned), the cross-tier parity
    discipline of the BM25 scan-local/indexed pair.
    """
    if len(weights) > 65536:
        raise ValueError(
            f"{len(weights)} weights is too large for a plan-embedded "
            "map literal; use score_hashed_linear (broadcast join tier)"
        )
    pairs = []
    for k in sorted(weights):
        pairs.append(F.lit(int(k)).cast("long"))
        pairs.append(F.lit(int(weights[k])).cast("long"))
    wmap = F.create_map(*pairs) if pairs else F.create_map().cast("map<bigint,bigint>")
    toks = F.filter(bpe_ish_tokens(text_col), lambda t: t != "")
    score_nano = F.aggregate(
        toks,
        F.lit(int(bias_nano)).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(wmap, hashed_feature(t, dim, feature_hash)),
            F.lit(0).cast("long"),
        ),
    )
    score = (score_nano.cast("double") / NANO).alias("score")
    return df.select(
        "*",
        score,
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(score_nano.cast("double") / NANO)))
        ).alias("prob"),
    )


def calibrate_threshold(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Operating-point table for a scored validation set: one row per
    DISTINCT score with the exact confusion counts and nano-unit
    precision/recall/F1 of the rule ``predict positive iff score >=
    that score`` — pick a row, use its score as the production
    threshold (e.g. max f1_nano, or the first row whose precision
    clears a floor).

    The default ``score_col="score"`` matches what both scoring tiers
    (``score_hashed_linear`` / ``score_hashed_linear_map``) emit;
    grouping on that double is still exact because it is an integer
    nano score divided by 1e9 (one representable quotient per distinct
    integer at these magnitudes).

    Exact integers end to end: per-score (pos, neg) counts, cumulative
    sums down the score order, and metrics as BIGINT ``div`` nano
    ratios — no float comparisons anywhere, so the chosen threshold is
    engine- and partitioning-independent.  The cumulative window runs
    over DISTINCT scores (bounded by the validation set, which is
    small by construction — calibration data is hand-labeled); the
    corpus-grain aggregation below it is one groupBy.
    """
    per = scored.groupBy(score_col).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("_pos"),
        F.sum(F.when(F.col(label_col) == 1, 0).otherwise(1))
        .cast("long")
        .alias("_neg"),
    )
    w = (
        Window.orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total_pos = F.sum("_pos").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = (
        per.withColumn("tp", F.sum("_pos").over(w).cast("long"))
        .withColumn("fp", F.sum("_neg").over(w).cast("long"))
        .withColumn("fn", (total_pos - F.col("tp")).cast("long"))
    )
    nano = F.lit(1_000_000_000).cast("long")
    precision = F.expr("(tp * 1000000000L) div (tp + fp)")
    recall = F.expr("(tp * 1000000000L) div (tp + fn)")
    # F1 = 2tp / (2tp + fp + fn), computed directly from counts so the
    # nano rounding happens ONCE (never compounding p/r roundings)
    f1 = F.expr("(2 * tp * 1000000000L) div (2 * tp + fp + fn)")
    return cum.select(
        F.col(score_col).alias("threshold"),
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0, precision)
        .otherwise(nano)
        .alias("precision_nano"),
        F.when(F.col("tp") + F.col("fn") > 0, recall)
        .otherwise(nano)
        .alias("recall_nano"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0, f1
        ).otherwise(F.lit(0).cast("long")).alias("f1_nano"),
    )
