"""Corpus-curation operators batch 2: per-group document caps,
snapshot diffing, and token-distribution drift.

These are the governance layer of a training-data pipeline: cap how
much any one host/source contributes (C4 caps per-host page counts),
diff two corpus releases (what changed between Dolma v1.5 and v1.6),
and quantify how far one slice's token distribution drifts from the
corpus (the cheap proxy for "did this source shift under us").

All arithmetic is engine-portable: hashes are md5 hex strings, float
accumulations quantize to integer micro-units before summing (exact,
order-independent — see ``similarity.build_ivf_index`` for the same
rule), and final ratios round to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def per_group_cap(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic
    hash order (md5(salt_id)) — the C4-style per-host contribution cap.

    Scale shape: groups at or under the cap never enter a window.  One
    count aggregate (map-side combinable) finds the over-cap groups;
    its result is #groups rows — broadcast.  Rows of under-cap groups
    pass through with a broadcast semi-join only (no shuffle of the
    fact side); only the over-cap minority shuffles into the
    row_number window.  At 100 TB with a few mega-hosts this is the
    difference between windowing the whole corpus and windowing the
    hot tail — and the hot groups themselves are exactly the rows one
    cannot avoid sorting (an exact hash-order cap needs the cap-th
    smallest hash per group).

    NULL group keys are one group (SQL ``PARTITION BY`` semantics): the
    over-cap tag joins on a NULL-coalesced key so a NULL group larger
    than the cap is capped like any other — a plain equi-join would
    never match NULL and wave the whole group through.

    Returns the input rows plus ``_keep`` boolean (callers filter or
    audit); deterministic for any partitioning.
    """
    h = F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string")))
    # \x00 sentinel: outside any cast-to-string value's alphabet for
    # the types used as group keys here; collapses all NULLs into one
    # cappable group on both the count and the tag join
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00"))
    keyed = df.withColumn("_gk", gk)
    counts = keyed.groupBy("_gk").agg(F.count(F.lit(1)).alias("_gn"))
    over = counts.filter(F.col("_gn") > cap).select("_gk")
    tagged = keyed.join(
        F.broadcast(over.withColumn("_over", F.lit(True))), "_gk", "left"
    )
    small = tagged.filter(F.col("_over").isNull()).drop("_over").withColumn(
        "_keep", F.lit(True)
    )
    w = Window.partitionBy("_gk").orderBy(h.asc(), F.col(id_col).asc())
    big = (
        tagged.filter(F.col("_over"))
        .drop("_over")
        .withColumn("_keep", F.row_number().over(w) <= cap)
    )
    return small.unionByName(big).drop("_gk")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    attrs: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Diff two corpus snapshots: per-document status ``added`` /
    ``removed`` / ``changed`` / ``unchanged``.

    Compares md5 digests, never text: at 100 TB the full-outer join
    ships 32-byte digests + ids, co-partitioned on ``id_col`` — the
    text columns are pruned at the scan.  Carried attributes coalesce
    new-over-old so removed rows keep their provenance.
    """
    # NULL text must still count as "present" — md5(NULL) is NULL and
    # would read as a missing row; the \x00 sentinel is outside md5's
    # hex alphabet so it can never collide with a real digest
    dig = lambda c: F.coalesce(F.md5(c), F.lit("\x00"))  # noqa: E731
    o = old.select(
        F.col(id_col),
        dig(F.col(text_col)).alias("_od"),
        *[F.col(a).alias(f"_o_{a}") for a in attrs],
    )
    n = new.select(
        F.col(id_col),
        dig(F.col(text_col)).alias("_nd"),
        *[F.col(a).alias(f"_n_{a}") for a in attrs],
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") == F.col("_nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col(id_col),
        status.alias("status"),
        *[
            F.coalesce(F.col(f"_n_{a}"), F.col(f"_o_{a}")).alias(a)
            for a in attrs
        ],
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """The APPLY step of α-temperature domain mixing: materialize a
    downsampled corpus whose domain shares follow ``w_d ∝ share_d^α``
    (``text.domain_mixture_weights`` computes the weights; this
    enforces them).  Per-domain keep probability is the domain's boost
    normalized by the maximum boost (the largest-boost domain keeps
    everything — pure downsampling, no replication), and membership is
    a deterministic md5 bucket test, so a doc's fate never changes
    when the corpus is repartitioned and the same doc is kept across
    reruns (the ``data_split`` reshuffle-proof rule).

    Engine-exactness: domain token shares are integer ratios; the
    transcendental ``share^α`` quantizes to nano-units BEFORE the
    weight normalization sums (a raw double Σ over domains would be
    partition-order-dependent), and the final keep threshold is an
    integer compare of a 32-bit hash bucket against
    ``round(p_d · 2³²)``.

    Scale shape: weights are domain-cardinality-sized and broadcast;
    the corpus side is one scan + one broadcast join — zero shuffle of
    the fact table.  Returns input rows plus ``_keep``.
    """
    # tc is the ONLY corpus-derived frame in the weight chain; every
    # downstream aggregate (total, wsum, maxb) would re-run the corpus
    # token count through its lineage without this cut.  tc is
    # domain-cardinality-sized — the checkpoint is free, and the
    # corpus is scanned exactly twice (here + the final tag join).
    tc = df.groupBy(strata_col).agg(
        F.sum(F.size(tokens(text_col))).alias("_nt")
    ).localCheckpoint()
    total = tc.agg(F.sum("_nt").cast("double").alias("_t"))
    sh = tc.crossJoin(F.broadcast(total)).select(
        strata_col, (F.col("_nt") / F.col("_t")).alias("_share")
    )
    swq = F.round(F.pow(F.col("_share"), F.lit(alpha)) * F.lit(1e9)).cast("long")
    sc = sh.withColumn("_swq", swq)
    wsum = sc.agg(F.sum("_swq").alias("_ws"))
    boosted = sc.crossJoin(F.broadcast(wsum)).select(
        strata_col,
        (
            (F.col("_swq").cast("double") / F.col("_ws").cast("double"))
            / F.col("_share")
        ).alias("_boost"),
    )
    maxb = boosted.agg(F.max("_boost").alias("_mb"))
    thresholds = boosted.crossJoin(F.broadcast(maxb)).select(
        strata_col,
        F.round((F.col("_boost") / F.col("_mb")) * F.lit(4294967296.0))
        .cast("long")
        .alias("_thr"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.join(F.broadcast(thresholds), strata_col).withColumn(
        "_keep", bucket < F.col("_thr")
    ).drop("_thr")


def _q9(x: Column) -> Column:
    """Quantize a double to integer nano-units: summing BIGINTs is
    exact and order-independent, so aggregates built on this are
    bit-reproducible across engines and shuffle orderings."""
    return F.round(x * F.lit(1e9)).cast("long")


def token_distribution_drift(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group KL divergence of the token distribution against the
    whole-corpus distribution — the drift signal a curation pipeline
    watches per source/language/snapshot.

    KL(p_g || q) = Σ_t p_g(t)·ln(p_g(t)/q(t)); every token in a group
    also appears in the corpus, so q(t) > 0 always.  Per-token terms
    are quantized to nano-units and summed as BIGINT (order-free),
    then scaled back — a double SUM would drift with partition order
    and break the DuckDB oracle.

    One explode + two hash aggregates; the per-token join is on the
    (group, token) grain against a token-grain frame — broadcast-safe
    only if the vocab is bounded, so the corpus-side counts join keys
    on ``token`` and stays a shuffle join by design (the vocab of a
    100 TB corpus is NOT a broadcastable dim; the aggregate output is
    vocab-sized, far smaller than the exploded input).
    """
    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("token")
    )
    # (group × vocab)-sized; checkpoint before fan-out — g_counts feeds
    # the group totals, the corpus counts chain AND the per-token join,
    # so without the cut the corpus explode+groupBy runs once per
    # consumer (4 corpus scans in the plan, r10 scan audit)
    g_counts = tok.groupBy("grp", "token").agg(
        F.count(F.lit(1)).alias("c_g")
    ).localCheckpoint()
    g_tot = g_counts.groupBy("grp").agg(F.sum("c_g").alias("t_g"))
    all_counts = g_counts.groupBy("token").agg(F.sum("c_g").alias("c_all"))
    all_tot = all_counts.agg(F.sum("c_all").alias("t_all"))
    p = F.col("c_g") / F.col("t_g")
    q = F.col("c_all") / F.col("t_all")
    term = p * F.log(p / q)
    per_tok = (
        g_counts.join(all_counts, "token")
        .join(F.broadcast(g_tot), "grp")
        .crossJoin(F.broadcast(all_tot))
        .select("grp", "c_g", _q9(term).alias("_tq"))
    )
    return (
        per_tok.groupBy("grp")
        .agg(
            F.sum("c_g").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.round(F.sum("_tq") / F.lit(1e9), 6).alias("kl_to_corpus"),
        )
        .select(
            F.col("grp").alias(group_col), "n_tokens", "vocab", "kl_to_corpus"
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis (2006) exponential-jumps family, A-ES: each
    row draws a reproducible uniform u from md5(salt, id) and gets
    priority ``u^(1/w)``; the k largest priorities per group are an
    exact weighted sample without replacement.  Ranking by the log
    form ``ln(u)/w`` is monotone-equivalent and numerically tame.

    This is how a corpus takes "sample 10k documents per language,
    longer documents proportionally more likely" in ONE distributed
    pass with no RNG state: reshuffle-proof (the draw depends only on
    the id), restart-proof, and engine-replayable.  Scale shape:
    priority is scan-local arithmetic; the only shuffle is the
    per-group top-k (TakeOrderedAndProject-style window on the group
    key).  Weights must be > 0 (rows with w ≤ 0 are dropped — zero
    weight means zero inclusion probability anyway).

    The priority is quantized to an integer (``floor(ln(u)·1e9 / w)``)
    so ordering — and therefore the sample — is bit-identical across
    engines; ties break on id.
    """
    c_w = F.col(weight_col)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)  # (h + 0.5) / 2^32 keeps u strictly inside (0, 1)
    ) / F.lit(4294967296.0)
    scored = df.filter(c_w > 0).withColumn(
        "priority_q",
        F.floor(F.log(u) * F.lit(1000000000.0) / c_w).cast("long"),
    )
    order = [F.col("priority_q").desc(), F.col(id_col).asc()]
    if group_col is None:
        # global top-k: orderBy+limit plans as TakeOrderedAndProject
        # (per-partition heaps + driver merge), not a one-task window
        return scored.orderBy(*order).limit(k)
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ordering_mix_audit(
    df: DataFrame,
    group_col: str = "source",
    pos_col: str = "doc_id",
) -> DataFrame:
    """Shuffle-quality audit of a corpus ORDERING: for each group, how
    often is the next row (by position) the same group, versus the rate
    a well-shuffled order would show (= the group's share of the
    corpus)?  ``clump_ratio`` ≈ 1 means well mixed; ≫ 1 means runs of
    same-source documents — which turns into correlated batches when
    the file order feeds a trainer that shards sequentially.

    Scale shape: adjacency comes from a self-equi-join on
    ``pos + 1`` — NOT a ``lead()`` over a global ``orderBy`` window,
    which would collapse the whole corpus into one task.  The join is
    keyed (AQE-splittable) and both sides prune to two columns at the
    scan.  ``pos_col`` must be a dense position (a row's ordinal in
    the layout); gaps under-count pairs but never miscount them.

    Ratios quantize only at the emit (ROUND 6 of exact-integer
    operands), so both engines round the same doubles.

    Returns (group, n_docs, share, n_pairs_from, n_same, same_rate,
    clump_ratio) per group that starts at least one adjacent pair.
    """
    base = df.select(
        F.col(pos_col).alias("_pos"), F.col(group_col).alias("_g")
    )
    nxt = base.select(
        (F.col("_pos") - F.lit(1)).alias("_pos"),
        F.col("_g").alias("_g_next"),
    )
    pairs = base.join(nxt, "_pos")
    adj = pairs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_pairs_from"),
        F.sum(
            F.when(F.col("_g_next") == F.col("_g"), 1).otherwise(0)
        ).alias("n_same"),
    )
    tot = base.groupBy("_g").agg(F.count(F.lit(1)).alias("n_docs"))
    n_all = base.agg(F.count(F.lit(1)).alias("_n"))
    return (
        adj.join(F.broadcast(tot), "_g")
        .crossJoin(F.broadcast(n_all))
        .select(
            F.col("_g").alias(group_col),
            "n_docs",
            F.round(F.col("n_docs") / F.col("_n"), 6).alias("share"),
            "n_pairs_from",
            "n_same",
            F.round(F.col("n_same") / F.col("n_pairs_from"), 6).alias(
                "same_rate"
            ),
            F.round(
                (F.col("n_same") * F.col("_n"))
                / (F.col("n_pairs_from") * F.col("n_docs")),
                6,
            ).alias("clump_ratio"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_parts: int | None = None,
    eager_unpersist: bool = False,
) -> DataFrame:
    """Deterministic corpus shuffle for training order: every row gets
    a dense global position ``shuffle_pos`` under the md5(salt, id)
    total order — re-runnable bit-identically (change ``salt`` for a
    new epoch's permutation), and provably well-mixed: feeding the
    result to :func:`ordering_mix_audit` on ``shuffle_pos`` yields
    clump_ratio ≈ 1 for every source (tested).

    Scale shape: the rank is computed WITHOUT a global window —
    ``repartitionByRange`` on the shuffle key (sampled range exchange,
    no single-task sort) + per-partition ``row_number`` (window keyed
    by partition id — parallel), then per-partition offsets collected
    to the driver (one row per partition — bounded by cluster
    parallelism, the model-fit collect precedent) and added back via a
    broadcast join.  The md5 key tie-breaks on the id itself so the
    order is total even under hash collisions.

    Checkpoint storage (SCALE.md "Deterministic shuffle" note): the
    ranged frame is materialized because it feeds TWO jobs (the
    offset count and the final rank), so during the run the corpus
    occupies executor storage twice — once as the materialized blocks,
    once as the downstream write.  By default (localCheckpoint) the
    blocks are released only when the returned frame is
    garbage-collected; ``eager_unpersist=True`` instead caches the
    ranged frame through the cache manager (MEMORY_AND_DISK persist —
    the releasable kind; localCheckpoint blocks are NOT freed by
    ``Dataset.unpersist``), materializes the final positions, and
    frees the ranged copy IMMEDIATELY.  Persist semantics are safe
    here: block loss triggers recompute, and the recompute reproduces
    identical partitions because the range sampler is seeded per RDD
    and the (_sk, id) sort order is total.  Positions are identical
    either way (pytest-pinned).
    """
    key = F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string")))
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged_plan = (
        df.withColumn("_sk", key)
        .repartitionByRange(parts, F.col("_sk"), F.col(id_col))
        .sortWithinPartitions("_sk", id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # materialized because it feeds the offset count AND the final rank
    if eager_unpersist:
        from pyspark import StorageLevel

        ranged = ranged_plan.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        ranged = ranged_plan.localCheckpoint()
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    rows = sorted((r["_pid"], r["_c"]) for r in counts.collect())
    offsets, acc = {}, 0
    for pid, c in rows:
        offsets[pid] = acc
        acc += c
    off = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("_sk", id_col)
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off), "_pid")
        .withColumn("shuffle_pos", F.col("_off") + F.col("_rn") - 1)
        .drop("_sk", "_pid", "_rn", "_off")
    )
    if eager_unpersist:
        out = out.localCheckpoint()
        # blocking so the storage really is gone when this returns —
        # the whole point of the knob is a bounded residency window
        ranged.unpersist(blocking=True)
    return out


def mixture_budget_rates(
    counts: DataFrame,
    target_weights: dict[str, float],
    total_budget_tokens: int,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Solve the training-mix budget: given per-source available token
    counts and target mixture weights, how many tokens to DRAW from
    each source (and at how many epochs) to fill ``total_budget_tokens``
    — the recipe computation behind published LLM data mixes, where a
    small high-weight source is repeated up to ``max_epochs`` and any
    remaining deficit is re-spread over the sources that still have
    headroom (water-filling), proportionally to their target weights.

    Pure driver-side arithmetic over a SOURCE-CARDINALITY aggregate
    (the counts frame is the output of a corpus groupBy — dozens of
    rows at any corpus size), so an exact iterative solve is free; the
    result joins back to facts as a broadcast dim.  Returns one row
    per source: (group, n_tokens, target_weight, draw_tokens, epochs,
    capped).
    """
    rows = {r[group_col]: int(r[tokens_col]) for r in counts.collect()}
    unknown = set(target_weights) - set(rows)
    if unknown:
        raise ValueError(f"target_weights name unknown sources: {sorted(unknown)}")
    wsum = float(sum(target_weights.values()))
    want = {g: target_weights[g] / wsum for g in target_weights}

    draw = {g: 0.0 for g in want}
    capped: set[str] = set()
    remaining = float(total_budget_tokens)
    active = dict(want)
    # water-fill: allocate proportionally; sources hitting their epoch
    # cap freeze and their unmet share re-spreads over the rest.
    # Terminates: each pass either allocates all of `remaining` or
    # permanently freezes >= 1 source (<= len(sources) passes).
    while remaining > 1e-6 and active:
        asum = sum(active.values())
        next_active = {}
        allocated = 0.0
        for g, w in active.items():
            room = max_epochs * rows[g] - draw[g]
            share = remaining * w / asum
            take = min(share, room)
            draw[g] += take
            allocated += take
            if take < share - 1e-9:
                capped.add(g)
            else:
                next_active[g] = w
        remaining -= allocated
        if not next_active and remaining > 1e-6:
            break  # every source capped: budget not fillable
        active = next_active if len(next_active) < len(active) else (
            {} if remaining <= 1e-6 else next_active
        )
    spark = counts.sparkSession
    out = [
        (
            g,
            rows[g],
            round(want[g], 9),
            int(round(draw[g])),
            round(draw[g] / rows[g], 6) if rows[g] else 0.0,
            g in capped,
        )
        for g in sorted(want)
    ]
    return spark.createDataFrame(
        out,
        "source string, n_tokens long, target_weight double, "
        "draw_tokens long, epochs double, capped boolean",
    )


def mixture_budget_closed(
    counts: DataFrame,
    target_weights: dict[str, int],
    total_budget_tokens: int,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    max_epochs: int = 4,
) -> DataFrame:
    """Closed-form token-budget mixture solve — the DISTRIBUTED twin of
    :func:`mixture_budget_rates` (r8: upgrades the driver-side
    iterative water-fill to pure window arithmetic, so the solve is an
    oracle-verifiable DataFrame op and works unchanged if the "counts"
    frame is ever large, e.g. per-(source, lang, shard) strata).

    Water-filling with per-source epoch caps has a closed form: with
    cap_i = max_epochs·n_i and weight w_i, the allocation is
    draw_i = min(λ·w_i, cap_i) where λ is the water level solving
    Σ_i min(λ·w_i, cap_i) = B.  Sources sorted by r_i = cap_i/w_i cap
    in exactly that order as λ rises, so λ comes from one prefix-sum
    pass: for each candidate breakpoint k (first k sources capped),
    λ_k = (B − Σ_{j≤k} cap_j) / Σ_{j>k} w_j, and the valid k is the
    unique one with r_k ≤ λ_k (< r_{k+1}) — equivalently the LARGEST k
    with r_k·(remaining weight) ≤ remaining budget.  One sort by
    (cap/weight) over a source-cardinality frame + running sums: no
    iteration, no driver loop.

    Determinism contract (oracle posture): ``target_weights`` are
    INTEGER weights (parts-per-anything — only ratios matter), caps
    and budget are exact BIGINTs, so the breakpoint predicate
    r_k ≤ λ_k evaluates as the exact integer cross-multiplication
    cap_k·Σw_rest ≤ (B − Σcap)·w_k — NO floats anywhere in the
    branch decision.  Only the final λ·w_i draw is float (one
    correctly-rounded division and multiplication, identical on any
    IEEE engine), rounded half-up to whole tokens.

    Returns one row per source: (group, n_tokens, weight, cap_tokens,
    draw_tokens, epochs, capped), epochs rounded to 6.
    """
    if any(w <= 0 or w != int(w) for w in target_weights.values()):
        raise ValueError("target_weights must be positive integers")
    if max_epochs <= 0 or max_epochs != int(max_epochs):
        raise ValueError("max_epochs must be a positive integer")
    spark = counts.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in sorted(target_weights.items())],
        f"{group_col} string, weight long",
    )
    base = (
        counts.select(group_col, F.col(tokens_col).cast("long").alias("n_tokens"))
        .join(F.broadcast(wdf), group_col, "inner")
        .withColumn("cap_tokens", F.lit(int(max_epochs)) * F.col("n_tokens"))
    )
    # sort by r_i = cap/weight ascending: exact integer ordering via the
    # (cap·LCM-free) fraction compare — window over (cap*1.0/weight)
    # would be float; instead order by the exact rational using two
    # BIGINT sort keys is impossible in general, BUT ordering by the
    # double cap/weight ties-broken by group is safe here because a
    # float-order inversion can only occur between near-equal ratios,
    # and for EQUAL-ratio sources the breakpoint predicate (exact
    # integers) admits either order: both sources cap (or neither), so
    # the allocation is order-invariant.  Near-equal-but-unequal ratios
    # differ in well under 1 ulp only if cap_a·w_b = cap_b·w_a ± 1 at
    # magnitudes > 2^53 — caps beyond 9e15 tokens; documented bound.
    w_ord = Window.orderBy((F.col("cap_tokens") / F.col("weight")).asc(),
                           F.col(group_col).asc())
    ranked = base.withColumn("_k", F.row_number().over(w_ord))
    w_cum = (
        Window.orderBy("_k").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    B = F.lit(int(total_budget_tokens)).cast("long")
    annotated = (
        ranked
        .withColumn("_cap_cum", F.sum("cap_tokens").over(w_cum))
        .withColumn("_w_cum", F.sum("weight").over(w_cum))
        .withColumn("_cap_tot", F.sum("cap_tokens").over(w_all))
        .withColumn("_w_tot", F.sum("weight").over(w_all))
        # source k caps iff, with sources 1..k capped, the water level
        # still clears its ratio: cap_k·(Σw − Σw_cum_k) ≤
        # (B − Σcap_cum_k)·w_k  — exact BIGINT cross-multiply
        .withColumn(
            "capped",
            (F.col("cap_tokens") * (F.col("_w_tot") - F.col("_w_cum")))
            <= (B - F.col("_cap_cum")) * F.col("weight"),
        )
    )
    # budget not fillable: every source caps; clamp via greatest(0)
    w_capped = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    solved = (
        annotated
        .withColumn(
            "_cap_sum",
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("cap_tokens"))).over(w_capped),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "_w_rest",
            F.coalesce(
                F.sum(F.when(~F.col("capped"), F.col("weight"))).over(w_capped),
                F.lit(0).cast("long"),
            ),
        )
        # λ as ONE double division of exact BIGINTs (0 when all capped)
        .withColumn(
            "_lambda",
            F.when(
                F.col("_w_rest") > 0,
                F.greatest(B - F.col("_cap_sum"), F.lit(0).cast("long"))
                .cast("double") / F.col("_w_rest").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "draw_tokens",
            F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
                F.round(F.col("_lambda") * F.col("weight").cast("double"))
                .cast("long")
            ),
        )
        .withColumn(
            "epochs",
            F.round(
                F.col("draw_tokens").cast("double") / F.col("n_tokens"), 6
            ),
        )
    )
    return solved.select(
        group_col, "n_tokens", "weight", "cap_tokens",
        "draw_tokens", "epochs", "capped",
    )


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    fractions: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the split key is the document's duplicate-cluster
    component id (``dedup.connected_components`` output), falling back
    to the doc's own id for singletons — so an entire near-dup cluster
    lands on one side of every boundary.  Per-doc hash splits (the
    ``data_split`` registry row) put one member of a duplicate pair in
    train and its twin in test, which silently inflates eval scores;
    this is the split the dedup pipeline exists to enable.

    Assignment is ``deterministic_uniform(salt, key)`` against the
    cumulative fraction boundaries — reproducible on any engine, any
    partitioning, any rerun, and STABLE UNDER CORPUS GROWTH for
    singletons (a new doc never moves an old doc's split; a doc
    joining a cluster adopts the cluster's split).

    Scale shape: one left join docs⋈components on the id key (the
    components frame is cluster-members only — tiny next to the
    corpus), then pure column expressions.  No shuffle beyond the
    join.
    """
    from .text import deterministic_uniform

    total = sum(fractions.values())
    if not fractions or abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    comp = components.select(
        F.col("node").alias(id_col), F.col("component_id").alias("_comp")
    )
    keyed = docs.join(comp, id_col, "left").withColumn(
        "_split_key",
        F.coalesce(F.col("_comp"), F.col(id_col)).cast("string"),
    )
    u = deterministic_uniform(F.col("_split_key"), salt=salt)
    expr = None
    cum = 0.0
    *head, (last_name, _) = list(fractions.items())
    for name, frac in head:
        cum += frac
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return keyed.withColumn("split", expr).drop("_comp", "_split_key")


def shuffled_token_cum(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    tokens_col: str = "n_tokens",
    n_parts: int | None = None,
    out_col: str = "tok_before",
) -> DataFrame:
    """Fused :func:`deterministic_shuffle` + :func:`token_cum_before`
    (r14, guide §1.2 "remove unnecessary passes"): both the dense
    ``shuffle_pos`` and the exact tokens-before prefix sum come out of
    ONE range exchange, ONE materialization and ONE bounded collect.

    Run separately, the second stage re-range-partitions the corpus by
    ``shuffle_pos`` — but ``shuffle_pos`` is by construction the dense
    rank of the (md5 key, id) order the FIRST stage already ranged and
    sorted by, so its exchange, checkpoint and per-partition-stats
    collect are duplicates over the identical total order.  The fused
    per-partition stats row carries (row count, token total) together;
    prefix sums of both become the broadcast offsets.  Positions are
    the same integers as deterministic_shuffle's and the prefix sum is
    order-determined (partitioning-independent exact BIGINT), so
    results are bit-identical to the two-stage pipeline
    (parity-pinned in tests/test_curation.py).
    """
    key = F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string")))
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.withColumn("_sk", key)
        .withColumn("_tk", F.col(tokens_col).cast("long"))
        .repartitionByRange(parts, F.col("_sk"), F.col(id_col))
        .sortWithinPartitions("_sk", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # coalesce: SUM over an all-NULL partition is NULL, and the driver
    # accumulation below would TypeError on it — mirror the window
    # side's NULL-to-0 coalescing (ADVICE r14)
    stats = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_c"),
        F.coalesce(F.sum("_tk"), F.lit(0)).alias("_t"),
    )
    offs, acc_rows, acc_tok = [], 0, 0
    for pid, c, t in sorted((r["_pid"], r["_c"], r["_t"]) for r in stats.collect()):
        offs.append((int(pid), int(acc_rows), int(acc_tok)))
        acc_rows += c
        acc_tok += t
    off = df.sparkSession.createDataFrame(offs, "_pid int, _roff long, _toff long")
    w = Window.partitionBy("_pid").orderBy("_sk", id_col)
    wv = w.rowsBetween(Window.unboundedPreceding, -1)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cum_local", F.coalesce(F.sum("_tk").over(wv), F.lit(0)))
        .join(F.broadcast(off), "_pid")
        .withColumn("shuffle_pos", F.col("_roff") + F.col("_rn") - 1)
        .withColumn(out_col, (F.col("_toff") + F.col("_cum_local")).cast("long"))
        .drop("_sk", "_tk", "_pid", "_rn", "_cum_local", "_roff", "_toff")
    )


def token_cum_before(
    df: DataFrame,
    order_col: str = "shuffle_pos",
    tokens_col: str = "n_tokens",
    n_parts: int | None = None,
    eager_unpersist: bool = False,
    out_col: str = "tok_before",
) -> DataFrame:
    """Exact-BIGINT tokens-before-this-doc over a TOTAL corpus order —
    the distributed prefix sum shared by :func:`token_shard_ids` and
    :func:`concat_split_layout`.

    Single-node semantics are ``SUM(tokens) OVER (ORDER BY pos ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)``; a global window funnels
    100 TB through one task, so this computes it two-phase: range
    exchange on the order key, per-partition running sums (parallel
    windows keyed by partition id), then one bounded collect of
    per-partition token TOTALS whose prefix sums become broadcast
    offsets.  ``order_col`` must be globally unique so cum-before is
    well-defined.  ``eager_unpersist`` is the bounded-residency knob of
    :func:`deterministic_shuffle` (the ranged frame feeds two jobs).
    """
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged_plan = (
        df.withColumn("_tk", F.col(tokens_col).cast("long"))
        .repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    if eager_unpersist:
        from pyspark import StorageLevel

        ranged = ranged_plan.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        ranged = ranged_plan.localCheckpoint()
    # NULL-to-0 like the window side: an all-NULL partition must not
    # TypeError the driver accumulation (ADVICE r14)
    totals = ranged.groupBy("_pid").agg(
        F.coalesce(F.sum("_tk"), F.lit(0)).alias("_t")
    )
    acc = 0
    offsets = []
    for pid, t in sorted((r["_pid"], r["_t"]) for r in totals.collect()):
        offsets.append((int(pid), int(acc)))
        acc += t
    off = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.withColumn("_cum_local", F.coalesce(F.sum("_tk").over(w), F.lit(0)))
        .join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_cum_local")).cast("long"))
        .drop("_tk", "_pid", "_cum_local", "_off")
    )
    if eager_unpersist:
        out = out.localCheckpoint()
        ranged.unpersist(blocking=True)
    return out


def token_shard_ids(
    df: DataFrame,
    order_col: str = "shuffle_pos",
    tokens_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
    n_parts: int | None = None,
    eager_unpersist: bool = False,
) -> DataFrame:
    """Token-budget shard assignment over a TOTAL corpus order: a
    document's shard is ``floor(tokens-before-it / shard_tokens)`` —
    the trainer-facing layout where every output shard holds ~budget
    tokens of CONTIGUOUS training order (documents never split).  Pair
    with :func:`deterministic_shuffle` for ``order_col``.

    Single-node semantics are a global running sum (``SUM(tokens) OVER
    (ORDER BY pos ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``); a
    global window funnels 100 TB through one task, so this computes the
    prefix sum with the two-phase shape of ``deterministic_shuffle``:
    range-exchange on the order key, per-partition running sums
    (parallel windows keyed by partition id), then one bounded collect
    of per-partition token TOTALS whose prefix sums become broadcast
    offsets.  ``order_col`` must be globally unique (a shuffle_pos or
    any total-ordering key) — uniqueness makes the in-partition order
    total, so cum-before is well-defined.

    Token counts quantize to BIGINT by construction (counts); the
    shard id is exact integer arithmetic end to end — bit-reproducible
    across engines and partitionings (staged oracle row
    ``train_shards`` proves the distributed prefix sum equals the
    single-node window).

    ``eager_unpersist`` is the same bounded-residency knob as
    :func:`deterministic_shuffle` (SCALE.md "Deterministic shuffle"):
    the ranged frame feeds two jobs (totals + final ids), so it is
    materialized; with the knob on it goes through the releasable
    cache manager and frees as soon as the result materializes.
    """
    cum = token_cum_before(
        df, order_col, tokens_col, n_parts, eager_unpersist, out_col="_cum"
    )
    return cum.withColumn(
        # exact BIGINT division (never a double quotient — a
        # float-rounded cum/budget near a shard boundary could
        # flip the id; `div` is exact at any corpus size)
        "shard_id",
        F.expr(f"_cum div {int(shard_tokens)}"),
    ).drop("_cum")


def concat_split_layout(
    df: DataFrame,
    order_col: str = "shuffle_pos",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    n_parts: int | None = None,
    eager_unpersist: bool = False,
) -> DataFrame:
    """GPT-style concat-and-split placement: the training stream is the
    documents CONCATENATED in corpus order and cut into fixed
    ``seq_len``-token sequences, documents splitting across sequence
    boundaries (the standard causal-LM pretraining layout — vs
    :func:`token_shard_ids`, which never splits a document).

    Each document gets its exact placement, all in BIGINT arithmetic on
    the shared distributed prefix sum (:func:`token_cum_before`):

    * ``tok_before`` — tokens in the stream before this doc;
    * ``seq_id``     — sequence holding the doc's first token
      (``tok_before div seq_len``);
    * ``seq_offset`` — position of that token within the sequence;
    * ``end_seq``    — sequence holding the doc's LAST token (equals
      ``seq_id`` for empty docs, which occupy no tokens);
    * ``n_seqs``     — sequences the doc spans.

    This is the full layout a loader needs to materialize any sequence
    (and its attention-mask document boundaries) by reading only the
    docs whose ``[seq_id, end_seq]`` range covers it; pair with
    :func:`sequence_manifest` for the per-sequence span table.  Exact
    integer end to end → bit-reproducible across engines and
    partitionings.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    cum = token_cum_before(
        df, order_col, tokens_col, n_parts, eager_unpersist
    )
    tok = F.col(tokens_col).cast("long")
    seq_id = F.expr(f"tok_before div {L}")
    return (
        cum.withColumn("seq_id", seq_id)
        .withColumn("seq_offset", F.pmod(F.col("tok_before"), F.lit(L)).cast("long"))
        .withColumn(
            "end_seq",
            F.when(tok > 0, F.expr(f"(tok_before + {tokens_col} - 1) div {L}"))
            .otherwise(F.col("seq_id"))
            .cast("long"),
        )
        .withColumn("n_seqs", (F.col("end_seq") - F.col("seq_id") + 1).cast("long"))
    )


def sequence_manifest(
    layout: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
) -> DataFrame:
    """Per-sequence document spans from a :func:`concat_split_layout`
    frame: one row per (sequence, document) with the doc's token range
    inside that sequence — exactly the table an attention-mask builder
    or a seek-free loader consumes.

    A doc spanning k sequences explodes to k rows (``sequence(seq_id,
    end_seq)`` — bounded: a doc spans ``ceil(n_tok/seq_len)+1``
    sequences), then pure arithmetic clamps its global token interval
    to each sequence window.  One shuffle (the groupBy-free explode is
    scan-shaped; callers usually write this hive-partitioned or sorted
    by ``seq_id``).
    """
    L = int(seq_len)
    tok = F.col(tokens_col).cast("long")
    exploded = layout.filter(tok > 0).select(
        id_col,
        "tok_before",
        tok.alias("_n"),
        F.explode(F.sequence(F.col("seq_id"), F.col("end_seq"))).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * L
    begin = F.greatest(F.lit(0).cast("long"), F.col("tok_before") - seq_start)
    end = F.least(F.lit(L).cast("long"), F.col("tok_before") + F.col("_n") - seq_start)
    return exploded.select(
        "seq_id",
        F.col(id_col),
        begin.alias("begin_in_seq"),
        end.alias("end_in_seq"),
        (end - begin).alias("n_tok_in_seq"),
    )


def cluster_balanced_sample(
    docs: DataFrame,
    centroids: DataFrame,
    budget: int,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced diversity sampling — the DataComp/DCLM-style
    curation step that keeps a GLOBAL budget of documents while
    preserving the embedding-space topic mix instead of letting one
    dominant cluster eat the whole budget (cf. SemDeDup/DataComp's
    cluster-then-filter; reference parity: the per-stratum quota
    discipline of R/validation.R's per-district caps, generalized to
    learned strata).

    Three exact steps, no RNG, no floats in the allocation:

    1. Every document joins its nearest shared centroid via
       :func:`operators.similarity.assign_to_centroids` — the IVF
       membership rule reused VERBATIM, so sampling strata coincide
       with the index/dedup/drift views of the embedding space.
    2. The budget apportions across clusters proportionally to cluster
       mass with the largest-remainder (Hamilton) method in pure
       BIGINT arithmetic: ``quota_c = budget·n_c DIV N``, then the
       ``budget − Σ quota`` leftover seats go to the largest
       remainders (ties on centroid_id).  Since ``budget·n_c DIV N <
       n_c`` whenever ``budget < N``, every allocation is feasible and
       EXACTLY ``min(budget, N)`` rows return.
    3. Each cluster keeps its top ``alloc_c`` rows by
       (``quality_col`` desc, id asc) — deterministic for any
       partitioning.

    Scale shape: the centroid table broadcasts (C×d, index-constant);
    apportionment runs entirely on the C-row counts frame (the
    single-partition ranking window touches C rows, never data); the
    allocation table re-broadcasts; one per-cluster top-k window does
    the selection — per-stratum sorts, never a global one.  Exactly
    two passes over the corpus (the count pass and the select pass) —
    the inherent minimum for a global-budget sampler.  The window
    parallelism is C tasks, so SIZE C TO THE CORPUS (DataComp uses
    ~100k clusters at web scale; C here is whatever centroid table the
    caller trained) — with corpus/C rows per task the sort stays
    executor-sized.
    """
    from .similarity import assign_to_centroids

    # quality rides THROUGH the assignment (carry_cols) instead of a
    # corpus re-join by id: one scan + zero extra shuffle for data the
    # assignment window already held (scan_audit r12).
    # Materialized (r15, guide §2.4): the assignment feeds BOTH corpus
    # passes (the count pass and the select pass), and un-checkpointed
    # the crossJoin+cosine+top-1 window re-derived per pass — two full
    # assignment computations for one sampler.  The checkpointed frame
    # is only (id, centroid_id, quality) — embedding dropped — so the
    # materialization is corpus-rows × 3 narrow columns.  Measured at
    # sf0.1: 1.38 → 1.10 s min, identical rows.
    scored = assign_to_centroids(
        docs.select(id_col, vec_col, quality_col),
        centroids,
        corpus_id=id_col,
        vec_col=vec_col,
        carry_cols=[quality_col],
    ).select(id_col, "centroid_id", quality_col).localCheckpoint()

    # the C-row counts frame fans out to four consumers (tot, quota,
    # qsum, alloc) — without a cut Catalyst re-derives the full
    # assignment crossJoin+window once per consumer (the multi-consumer
    # recompute class, see SCALE.md); checkpointing C rows is free and
    # leaves exactly two passes over the corpus: the count pass and the
    # select pass — the inherent minimum for a global-budget sampler
    # (allocation needs N before any row can be kept)
    counts = (
        scored.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint()
    )
    tot = counts.agg(F.sum("_n").cast("long").alias("_tot"))
    b = F.lit(int(budget)).cast("long")
    q = counts.crossJoin(F.broadcast(tot)).select(
        "centroid_id",
        "_n",
        F.expr(f"CAST({int(budget)} AS BIGINT) * _n DIV _tot").alias("_quota"),
        (b * F.col("_n") % F.col("_tot")).alias("_rem"),
    )
    qsum = q.agg(F.sum("_quota").cast("long").alias("_qsum"))
    # single-partition window over the C-row quota frame: C is the
    # centroid-table cardinality (index-constant), never data-sized
    wrk = Window.orderBy(F.col("_rem").desc(), F.col("centroid_id").asc())
    alloc = (
        q.crossJoin(F.broadcast(qsum))
        .withColumn("_rk", F.row_number().over(wrk))
        .select(
            "centroid_id",
            "_n",
            (
                F.col("_quota")
                + F.when(F.col("_rk") <= b - F.col("_qsum"), 1).otherwise(0)
            ).cast("long").alias("_alloc"),
        )
    )

    # single window path: when budget < N every cluster over-allocates
    # STRICTLY (quota_c < n_c), so an over/under branch split would
    # route everything through the window anyway while doubling the
    # corpus scans (each union branch re-derives the assignment);
    # rn <= alloc subsumes the covered-cluster case (alloc_c >= n_c
    # keeps the whole cluster)
    tagged = scored.join(F.broadcast(alloc.drop("_n")), "centroid_id")
    w = Window.partitionBy("centroid_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_alloc"))
        .select(F.col(id_col), F.col("centroid_id"), F.col(quality_col))
    )
