"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* ``cosine_topk`` — brute-force exact top-k.  The corpus is scanned
  once per query *batch* (queries broadcast), so cost is
  O(|corpus|·|queries|) FLOPs with zero corpus shuffle — the right
  baseline up to ~10⁶×10³.
* ``lsh_topk`` — random-hyperplane LSH: corpus and queries bucket by
  sign-pattern; only same-bucket pairs score.  Sub-linear candidate
  sets at 100 TB scale; recall tunable via n_planes/n_tables.

All arithmetic is double-precision sequential folds (``aggregate``)
over index order, which makes results bit-reproducible across engines —
the DuckDB oracle exploits that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


# Static-unroll width for the one PAIR-VOLUME-dominated dot fold
# (``cosine_block_pairs``).  Higher-order functions are CodegenFallback
# in Spark — ``_dot``'s zip_with/aggregate fold is evaluated
# interpretively, one tree-walk per element per PAIR, which profiling
# showed dominates the within-block cosine edge operators.  For arrays
# of exactly this length ``_dot_unrolled`` emits the fold as a FLAT
# ``((0.0 + a1·b1) + a2·b2) + …`` chain that WholeStageCodegen compiles
# to straight-line arithmetic: the identical IEEE additions in the
# identical order, so results are bit-for-bit the fold's; any other
# length takes the general interpreted branch.  Deliberately NOT used
# inside ``_dot`` itself: the ~300-node unrolled tree embedded at every
# dot site of the ANN plans (Lloyd iterations, top-k scoring) blew up
# Catalyst planning — measured ivf_audit 4.7 s → 16.0 s, ann_audit
# 2.8 s → 5.0 s with a global unroll, versus a win only where ONE plan
# site scores hundreds of thousands of pairs (r14).
_UNROLL_DIM = 64


_DOT_UNROLL_SQL: dict = {}


def _dot_unrolled(a: str | Column, b: str | Column) -> Column:
    """When given column NAMES, the flat 64-term chain is emitted as
    ONE ``expr()`` parse: the per-term py4j construction (~6 gateway
    round-trips × 64 terms) measured as real driver time in every
    pair-scoring query build (the ann_lsh finding, r14).
    ``0.0D + CAST(element_at(a,1) AS DOUBLE) * …`` parses to the
    identical left-associated Add/Multiply/Cast tree the Column form
    built, so plans and results are bit-identical.  Only the SQL
    STRING is cached (per name pair); ``F.expr`` runs per use — one
    round-trip — so no py4j-backed handle outlives its gateway
    (ADVICE r14: a module-level Column cache served stale handles
    across a JVM restart)."""
    if isinstance(a, str) and isinstance(b, str):
        key = (a, b)
        sql = _DOT_UNROLL_SQL.get(key)
        if sql is None:
            terms = " + ".join(
                f"CAST(element_at({a}, {i}) AS DOUBLE)"
                f" * CAST(element_at({b}, {i}) AS DOUBLE)"
                for i in range(1, _UNROLL_DIM + 1)
            )
            sql = f"0.0D + {terms}"
            _DOT_UNROLL_SQL[key] = sql
        acc = F.expr(sql)
        a, b = F.col(a), F.col(b)
    else:
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        acc = F.lit(0.0)
        for i in range(1, _UNROLL_DIM + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
    return F.when(
        (F.size(a) == _UNROLL_DIM) & (F.size(b) == _UNROLL_DIM), acc
    ).otherwise(_dot(a, b))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def with_norm(df: DataFrame, vec_col: str = "embedding", norm_col: str = "_norm") -> DataFrame:
    """Attach the L2 norm as a scalar column.

    Precomputing norms *before* a pairwise join is the key similarity
    optimization: cosine over N·M pairs then needs one dot fold per
    pair instead of three (dot + both norms), and each row's norm is
    computed once, not once per pair.
    """
    return df.withColumn(norm_col, _norm(F.col(vec_col)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Queries are broadcast against the corpus (no corpus shuffle); norms
    are precomputed per row; the per-query top-k runs as one window rank
    over the scored pairs, with ``corpus_id`` as the deterministic
    tie-break.
    """
    q = with_norm(queries.select(F.col(query_id), F.col(vec_col).alias("_qv")), "_qv", "_qn")
    c = with_norm(corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv")), "_cv", "_cn")
    scored = c.crossJoin(F.broadcast(q)).filter(F.col(query_id) != F.col(corpus_id))
    scored = scored.select(
        query_id,
        corpus_id,
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_sim"),
        )
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Nearest-centroid assignment — the IVF posting-list membership
    rule, shared verbatim by the index BUILD (each Lloyd iteration) and
    by INCREMENTAL APPEND (`operators/ann_index.py`): frozen-centroid
    adds must use the exact expression training used, or the appended
    postings would not match a from-scratch rebuild.

    One broadcast of the (C×d) centroid table against the corpus, a
    per-row top-1 window on the corpus id (each partition holds whole
    id-groups of C rows — no skew), ties broken on ``centroid_id`` so
    the assignment is total and engine-reproducible.

    ``carry_cols`` ride corpus columns through the assignment so a
    caller needing them downstream (quality scores, lengths) doesn't
    re-join the corpus by id — at 100 TB that re-join is a second
    corpus scan plus a corpus-sized shuffle for data the window pass
    already held.
    """
    carry = list(carry_cols)
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(corpus_id),
        F.col(vec_col),
        *[F.col(c) for c in carry],
        F.col("centroid_id"),
        _dot(F.col(vec_col), F.col("centroid")).alias("_sim"),
        (_norm(F.col(vec_col)) * _norm(F.col("centroid"))).alias("_nn"),
    )
    w = Window.partitionBy(corpus_id).orderBy(
        (F.col("_sim") / F.col("_nn")).desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(corpus_id, vec_col, *carry, "centroid_id")
    )


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: Lloyd's k-means in pure DataFrame ops.

    Returns (assignments, centroids): ``assignments`` maps each corpus
    row to its nearest centroid id; ``centroids`` holds the centroid
    vectors.  Init picks the ``n_centroids`` rows with the smallest
    ``md5(id)`` — a deterministic pseudo-random sample (no
    Date.now/rand — reproducible builds; md5 rather than xxhash64 so
    any engine can replay the choice) that compiles to
    ``TakeOrderedAndProject``: each task keeps its local top-C, the
    driver merges C·partitions candidates.  No global sort, no
    ``count()`` action, nothing single-partition touches the full
    corpus (the old ``row_number().over(Window.orderBy(id))`` init
    funnelled the whole corpus through one task).  Each Lloyd iteration
    is one broadcast-join assignment pass + one posexplode/groupBy
    mean — O(N·C·d) compute, shuffles only the exploded
    (cluster, pos, val) triples.

    Centroid means are computed in integer micro-units (``round(val *
    1e8)`` summed as BIGINT, divided back to double): exact and
    order-independent, so the whole index build is bit-reproducible
    across engines AND across shuffle orderings — a float ``avg`` would
    drift with partition order.  At 100 TB: N·C·d FLOPs per iteration
    distribute evenly; the centroid table (C×d doubles) always
    broadcasts; BIGINT partial sums overflow at ~9e18, i.e. ≥10¹⁰ rows
    per (cluster, pos) cell at 1e8 scaling — raise the scale knob down
    if the corpus exceeds that.
    """
    seeds = (
        corpus.select(
            F.md5(F.col(corpus_id).cast("string")).alias("_h"),
            F.col(vec_col).alias("centroid"),
        )
        .orderBy("_h")
        .limit(n_centroids)
    )
    # numbering the C seed rows is a window over ≤ n_centroids rows —
    # bounded by C, never by the corpus
    centroids = seeds.withColumn(
        "centroid_id", (F.row_number().over(Window.orderBy("_h")) - 1).cast("int")
    ).select("centroid_id", "centroid")
    # r14 NB: deliberately NOT checkpointed (same finding as the PQ
    # codebooks below): consumers broadcast identical centroid
    # subtrees, which ReuseExchange executes once — and the registered
    # audit row UNIONS two index builds over the same corpus, whose
    # shared Lloyd subtrees also reuse; eager per-iteration checkpoints
    # broke both sharings and measured ~2× slower on ivf_audit.

    def assign(cents: DataFrame) -> DataFrame:
        return assign_to_centroids(corpus, cents, corpus_id, vec_col)

    assignments = assign(centroids)
    for _ in range(n_iters - 1):
        # recompute centroids as element-wise means of their members
        exploded = assignments.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = (
            exploded.groupBy("centroid_id", "pos")
            .agg(
                F.sum(
                    F.round(F.col("val").cast("double") * 1e8).cast("long")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "centroid_id",
                "pos",
                (F.col("_s").cast("double") / F.col("_n") / F.lit(1e8)).alias("m"),
            )
        )
        centroids = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m.cast("float"),
                ).alias("centroid")
            )
        )
        assignments = assign(centroids)
    return assignments, centroids


def ivf_topk(
    queries: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: route each query to its ``n_probe`` nearest
    centroids, score only vectors assigned to those clusters.

    Candidate count ≈ N·n_probe/C instead of N — the standard
    recall/latency dial.  The probe join is equi-keyed on centroid_id.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    probes = q.crossJoin(F.broadcast(centroids)).select(
        query_id,
        "_qv",
        "centroid_id",
        (_dot(F.col("_qv"), F.col("centroid"))
         / (_norm(F.col("_qv")) * _norm(F.col("centroid")))).alias("_csim"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("_csim").desc(), F.col("centroid_id"))
    probed = probes.withColumn("_rk", F.row_number().over(wq)).filter(
        F.col("_rk") <= n_probe
    ).select(query_id, "_qv", "centroid_id")

    # broadcast the probe side (|Q|·n_probe rows): the alternative is a
    # shuffle of the corpus-sized assignments table onto C distinct
    # centroid keys — low-cardinality, skewed, and pointless at scale
    cands = assignments.join(F.broadcast(probed), "centroid_id").filter(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = cands.select(
        query_id,
        corpus_id,
        (_dot(F.col("_qv"), F.col(vec_col))
         / (_norm(F.col("_qv")) * _norm(F.col(vec_col)))).alias("_cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_sim"),
        )
    )


def _plane_weights(plane_seed: int, dim: int) -> list[float]:
    """The hyperplane weight vector for ``plane_seed``: weight per index
    is md5-derived in [-0.5, 0.5).  Computed DRIVER-SIDE: the md5 input
    is ``f"{seed}_{index}"`` — independent of the data — so evaluating
    it per row per element (as the expression form did) repeated the
    same ``dim`` md5+conv calls for every vector; at n_tables×n_planes
    planes that was ~768 md5 evaluations per corpus row.  Python's
    hashlib md5 over the identical UTF-8 string, the exact-for-2^32
    int→double conversion, the exact power-of-two division by 2^32 and
    one subtraction reproduce the in-plan arithmetic bit-for-bit, so
    signatures (and the oracle hashes) are unchanged."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane_seed}_{i}".encode()).hexdigest()[:8], 16)
        / 4294967296.0
        - 0.5
        for i in range(1, dim + 1)
    ]


_PLANE_W_SQL: dict = {}


def _plane_weight_col(plane_seed: int, dim: int) -> Column:
    """The weight vector as ONE array literal, SQL cached per
    (seed, dim).  ``F.lit(list)`` expands to ``dim`` element ``lit``
    calls plus an ``array`` call — ~130 py4j round-trips per plane,
    which cProfile showed was ~3.2 s of the 24-plane ann_lsh build
    (10,506 socket round-trips).  A single ``expr("array(…D, …)")``
    is one round-trip; Python float ``repr`` is shortest-roundtrip and
    Java's ``Double.parseDouble`` is correctly rounded, so the parsed
    doubles are bit-identical to the ``lit`` path.  Only the SQL
    string is cached — ``F.expr`` runs per use so no py4j-backed
    handle outlives its gateway (ADVICE r14)."""
    key = (plane_seed, dim)
    sql = _PLANE_W_SQL.get(key)
    if sql is None:
        ws = ",".join(f"{w!r}D" for w in _plane_weights(plane_seed, dim))
        sql = f"array({ws})"
        _PLANE_W_SQL[key] = sql
    return F.expr(sql)


def _plane_sign(vec: Column, plane_seed: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane side: the sign of the
    projection onto the md5-derived weight vector (a literal array —
    see :func:`_plane_weights`).  Reproducible anywhere md5 is."""
    w = _plane_weight_col(plane_seed, dim)
    proj = F.aggregate(
        F.zip_with(vec, w, lambda x, wi: x.cast("double") * wi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def _plane_sign_sql(vec_sql: str, plane_seed: int, dim: int) -> str:
    """SQL form of :func:`_plane_sign` — the same zip_with/aggregate
    projection fold the Column form builds, emitted as text so a whole
    bucket is ONE py4j round-trip (see :func:`lsh_bucket`)."""
    ws = ",".join(f"{w!r}D" for w in _plane_weights(plane_seed, dim))
    return (
        f"CAST((aggregate(zip_with({vec_sql}, array({ws}), "
        f"(x, wi) -> CAST(x AS DOUBLE) * wi), 0.0D, "
        f"(acc, v) -> acc + v) >= 0) AS INT)"
    )


def lsh_bucket(vec: Column | str, n_planes: int, dim: int, table: int = 0) -> Column:
    """Sign-pattern bucket id from ``n_planes`` random hyperplanes.

    Pass ``vec`` as a column NAME to build the whole bucket as one
    ``expr`` — a single py4j round-trip instead of ~40 per plane for
    the Column-composition form (the fold lambdas and casts each cost
    a driver socket round-trip; cProfile showed plan CONSTRUCTION, not
    execution, dominating the LSH rows).  Both forms parse/compose to
    identical expressions, so buckets are bit-identical."""
    if isinstance(vec, str):
        parts = ",".join(
            f"CAST({_plane_sign_sql(vec, table * 1000 + p, dim)} AS STRING)"
            for p in range(n_planes)
        )
        return F.expr(f"concat_ws('', {parts})")
    bits = [_plane_sign(vec, table * 1000 + p, dim) for p in range(n_planes)]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def _flip_bit(bucket: Column, p: int) -> Column:
    """The bucket string with bit ``p`` (0-indexed) flipped — a
    Hamming-1 probe neighbor."""
    return F.concat(
        F.substring(bucket, 1, p),
        F.when(F.substring(bucket, p + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bucket, p + 2, 2_000_000),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    n_tables: int = 4,
    n_probe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket pairs are scored.

    MEASURED RECALL — read before picking dials.  Top-5 recall against
    brute-force cosine on the harness embeddings
    (``tools/ann_sweep.py``, recorded in ``ann_sweep_last_run.json``):

    * sf0.1, n_planes=6: n_tables 1/2/4 → 0.05/0.105/0.19;
      n_probe 1/2/4/7 (single table) → 0.05/0.075/0.135/0.235.
    * sf0.001 operating points: (planes=8, tables=1, probe=1) → 0.02;
      (planes=6, tables=4, probe=4) → 0.52;
      (planes=4, tables=4, probe=4) → 0.90 — the DEFAULT here, pinned
      by ``test_lsh_default_dials_meet_documented_recall``.

    The defaults are therefore a ≥0.5-recall operating point, NOT the
    cheapest one: fewer planes → coarser buckets → more candidates
    scored.  For guaranteed-high recall retrieval use the IVF tier
    (``ivf_topk``: recall 1.0 at n_probe=8 in the same sweep, and
    cheaper than LSH at equal recall on this corpus).  LSH earns its
    keep as the streaming/incremental tier — bucket ids are pure
    column expressions, so new corpus rows index without retraining —
    and as a candidate pre-filter where downstream exact scoring
    tolerates misses.  The near-dup DEDUP banding tier is a separate
    audited path (recall 1.0 via ``tools/dedup_recall_audit.py``);
    this note is about RETRIEVAL recall only.

    The corpus→bucket map is computed once (column expression on scan);
    the join is equi-keyed on (table, bucket), so at scale the shuffle
    moves each corpus row ``n_tables`` times rather than |Q| times.

    Two recall dials, both query-side-cheap:

    * ``n_tables`` — each extra hash table draws an independent set of
      hyperplanes; a neighbor is found if it collides in ANY table
      (miss probability decays geometrically), at the cost of one more
      bucket row per CORPUS vector.
    * ``n_probe`` — multi-probe: each query additionally looks in the
      ``n_probe − 1`` buckets at Hamming distance 1 from its own
      (fixed flip order 0,1,…; the classic multi-probe refinement
      orders flips by projection confidence, at the cost of carrying
      the projections).  Probing replicates only the QUERY side — the
      corpus bucket table is untouched, which is why multi-probe is
      the preferred dial at 100 TB: recall rises without another pass
      over the corpus.

    Candidate pairs colliding via several tables/probes are
    deduplicated before scoring so each pair pays the cosine exactly
    once.  With one table and one probe a pair can collide at most
    once, so the explode and the pair-dedup shuffle are skipped
    entirely (scan-side bucket column + one equi-join — the r2 plan
    shape).
    """

    if n_probe > n_planes + 1:
        # A probe index >= n_planes would "flip" past the end of the
        # bucket string, producing a bucket no corpus row can ever
        # occupy — the recall dial would silently become a no-op plus
        # wasted query-side fan-out (mirrors the n_hashes guard in
        # dedup.py).
        raise ValueError(
            f"n_probe={n_probe} exceeds n_planes+1={n_planes + 1}: only the "
            "own bucket plus one Hamming-1 flip per plane exist"
        )

    def bucketed(
        df: DataFrame, id_c: str, v_alias: str, n_alias: str, probe: bool
    ) -> DataFrame:
        base = with_norm(
            df.select(F.col(id_c), F.col(vec_col).alias(v_alias)), v_alias, n_alias
        )
        if n_tables == 1 and not (probe and n_probe > 1):
            return base.select(
                id_c, v_alias, n_alias,
                F.lit(0).alias("tbl"),
                lsh_bucket(v_alias, n_planes, dim, table=0).alias("bucket"),
            )
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(v_alias, n_planes, dim, table=t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        out = base.select(
            id_c, v_alias, n_alias, F.explode(tables).alias("_tb")
        ).select(id_c, v_alias, n_alias, "_tb.tbl", "_tb.bucket")
        if probe and n_probe > 1:
            probes = F.array(
                F.col("bucket"),
                *[_flip_bit(F.col("bucket"), p) for p in range(n_probe - 1)],
            )
            out = out.select(
                id_c, v_alias, n_alias, "tbl", F.explode(probes).alias("bucket")
            )
        return out

    qb = bucketed(queries, query_id, "_qv", "_qn", probe=True)
    cb = bucketed(corpus, corpus_id, "_cv", "_cn", probe=False)
    cand = cb.join(F.broadcast(qb), ["tbl", "bucket"]).filter(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = cand.select(
        query_id,
        corpus_id,
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    if n_tables > 1 or n_probe > 1:
        # a pair colliding via several tables/probes scores the SAME
        # _cos each time (same two vectors), so dedup AFTER scoring by
        # (pair → first score): grouping on a double runs as a
        # HashAggregate with map-side partial aggregation, where the
        # former dropDuplicates carried the vector arrays through
        # first() and fell back to SortAggregate (sort + exchange +
        # sort).  Worst case re-scores a pair n_tables×n_probe times —
        # bounded and cheap next to the removed sorts.
        scored = scored.groupBy(query_id, corpus_id).agg(
            F.first("_cos").alias("_cos")
        )
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_sim"),
        )
    )


def cosine_block_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    backend: str = "jvm",
    n_parts: int = 4,
) -> DataFrame:
    """Within-block cosine near-dup edges ``(block, id_a < id_b,
    cosine_sim)`` — the backend-dispatched entry the curation pipeline
    uses (``plans/corpus.py``).

    * ``backend="jvm"`` — triangle-decomposed self-join + Catalyst
      ``zip_with``/``aggregate`` fold.  Bit-reproducible fold order, so
      this is the ORACLE path (``registry_text.q_embedding_near_dup``).
    * ``backend="arrow"`` — :func:`cosine_pairs_pandas`: one BLAS
      ``V @ V.T`` per block over Arrow batches.  Measured ~7× faster at
      sf0.1 and the documented PRODUCTION path; not the oracle because
      BLAS summation order is not bit-reproducible across engines.

    Both return the same pair set at the same threshold (parity test in
    tests/test_dedup_similarity_text.py); only the last float digits of
    ``cosine_sim`` may differ between backends.
    """
    if backend == "arrow":
        return cosine_pairs_pandas(
            df, block_col=block_col, id_col=id_col, vec_col=vec_col,
            threshold=threshold,
        )
    if backend != "jvm":
        raise ValueError(f"unknown backend {backend!r}: use 'jvm' or 'arrow'")
    from .skew import triangle_self_join

    base = with_norm(
        df.select(
            F.col(block_col), F.col(id_col).alias("id"), F.col(vec_col).alias("_e")
        ),
        "_e",
        "_n",
    )
    pairs = triangle_self_join(base, [block_col], "id", n_parts=n_parts)
    scored = pairs.select(
        block_col,
        "id_a",
        "id_b",
        (
            _dot_unrolled("_e_a", "_e_b")
            / (F.col("_n_a") * F.col("_n_b"))
        ).alias("_cos"),
    )
    # cosine is orientation-symmetric bit-for-bit (IEEE mult commutes
    # elementwise, fold order is array order on both sides), so
    # normalizing ids after scoring matches the oracle's a.id < b.id
    return scored.filter(F.col("_cos") >= threshold).select(
        block_col,
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.round(F.col("_cos"), 6).alias("cosine_sim"),
    )


def cosine_pairs_pandas(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Arrow/numpy backend for within-block pairwise cosine: one
    ``applyInPandas`` per block, pairwise similarity as a single
    ``V @ V.T`` matmul.

    The measured alternative to the JVM ``zip_with``/``aggregate`` fold
    (see ``registry_text.q_embedding_near_dup``): per-element Catalyst
    expression evaluation costs ~dim tree-walk steps per pair, while
    BLAS does the whole block in one call — but the rows pay an Arrow
    hop.  Keep whichever measures faster at your scale
    (tools/embedding_backend_bench.py); the JVM fold stays the ORACLE
    path because its sequential fold order is bit-reproducible in
    DuckDB, while BLAS summation order is not.

    Skew caveat: one block = one task.  A dominant block serializes —
    at scale feed this the (block, cell) groups of
    ``skew.triangle_self_join``'s decomposition instead of raw labels.
    """
    import numpy as np
    import pandas as pd

    block_field = df.schema[block_col]
    out_schema = (
        f"{block_col} {block_field.dataType.simpleString()}, "
        f"id_a long, id_b long, cosine_sim double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {block_col: [], "id_a": [], "id_b": [], "cosine_sim": []}
            )
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        S = (V @ V.T) / np.outer(norms, norms)
        ids = pdf[id_col].to_numpy()
        iu = np.triu_indices(len(ids), k=1)
        sims = S[iu]
        m = sims >= threshold
        ia, ib = ids[iu[0][m]], ids[iu[1][m]]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame(
            {
                block_col: pdf[block_col].iloc[0],
                "id_a": lo,
                "id_b": hi,
                "cosine_sim": np.round(sims[m], 6),
            }
        )

    return df.groupBy(block_col).applyInPandas(fn, out_schema)


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy backend for exact brute-force top-k: the query
    matrix is collected once (queries are small by construction — the
    same bound that justifies broadcasting them in ``cosine_topk``) and
    each corpus partition scores against it with one matmul via
    ``mapInPandas``, emitting its LOCAL per-query top-k; a final window
    over |queries|·k·partitions candidate rows picks the global top-k.

    Same shape as the JVM path — no corpus shuffle, only the tiny
    candidate set moves — but the inner loop is BLAS instead of
    per-element Catalyst expression evaluation (measured 7× on the
    pairwise variant).  The JVM path stays the oracle (bit-reproducible
    fold order); ties break on ``corpus_id`` here exactly as there.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id, vec_col).collect()
    if not q_rows:
        raise ValueError("empty query set")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, Qn))

    def score(batches):
        q_ids_b, Qn_b = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Qn_b @ Vn.T  # |Q| x |batch|
            ids = pdf[corpus_id].to_numpy()
            out_q, out_c, out_s = [], [], []
            kk = min(k, S.shape[1])
            for qi in range(S.shape[0]):
                s = S[qi].copy()
                s[ids == q_ids_b[qi]] = -np.inf  # self-match excluded
                # Local top-k must use the SAME tie-break as the global
                # window (cosine desc, corpus_id asc): a bare
                # argpartition on value alone can locally drop the
                # lower-id member of a tied pair (exact-duplicate
                # vectors) that the global ordering would keep.
                order = np.lexsort((ids, -s))[:kk]
                keep = s[order] > -np.inf  # masked self rows never leak
                top = order[keep]
                out_q.extend([q_ids_b[qi]] * len(top))
                out_c.extend(ids[top])
                out_s.extend(s[top])
            yield pd.DataFrame(
                {query_id: out_q, corpus_id: out_c, "_cos": out_s}
            )

    schema = f"{query_id} long, {corpus_id} long, _cos double"
    candidates = corpus.select(corpus_id, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC) —
# the memory-compression ANN tier (Jégou et al. 2011, "Product
# quantization for nearest neighbor search").  A d-dim float vector
# becomes m small codes (one per subspace), so a 100 TB embedding
# column shrinks to m bytes/vector; queries score candidates from a
# per-query distance table (ADC) without ever touching raw corpus
# vectors.  Complements the IVF routing tier: IVF prunes WHO to score,
# PQ compresses WHAT is scored.


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance — same bit-reproducibility
    contract as ``_dot`` (index-order double fold, DuckDB-replayable)."""
    diff = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)


def _subspaces(df: DataFrame, vec_col: str, m: int, d_sub: int) -> DataFrame:
    """Explode a vector column into m (subspace, subvec) rows."""
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select(
        *[c for c in df.columns if c != vec_col],
        F.explode(parts).alias("_sp"),
    ).select(*[c for c in df.columns if c != vec_col], "_sp.subspace", "_sp.subvec")


def _pq_assign(subs: DataFrame, codebooks: DataFrame, corpus_id: str) -> DataFrame:
    """Nearest-centroid code per (vector, subspace) against a broadcast
    codebook — the assignment kernel shared by the k-means build and
    the frozen-codebook encode."""
    scored = subs.join(F.broadcast(codebooks), "subspace").withColumn(
        "_d2", _l2sq(F.col("subvec"), F.col("centroid"))
    )
    w = Window.partitionBy(corpus_id, "subspace").orderBy(
        F.col("_d2").asc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(corpus_id, "subspace", "subvec",
                F.col("centroid_id").alias("code"))
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 2,
    dim: int = 64,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors under FROZEN codebooks — the FAISS add-time
    semantics (training moved the centroids; adds never do).  One
    broadcast join + per-(vector, subspace) argmin over the NEW rows
    only; identical assignment rule to the build's final pass, so an
    incrementally-encoded vector gets exactly the code a full rebuild
    with the same codebooks would give it (pytest-pinned).
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    subs = _subspaces(corpus.select(corpus_id, vec_col), vec_col, m, dim // m)
    return _pq_assign(subs, codebooks, corpus_id)


def build_pq_index(
    corpus: DataFrame,
    m: int = 2,
    k: int = 4,
    n_iters: int = 2,
    dim: int = 64,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks (Lloyd's k-means on L2) and encode
    the corpus.  Returns ``(codes, codebooks)``: codes is one row per
    (vector, subspace) with the assigned centroid id; codebooks is
    m·k rows of (subspace, centroid_id, centroid).

    Scale shape mirrors ``build_ivf_index``: seed selection is the k
    smallest md5(id) rows (TakeOrderedAndProject — no global sort, no
    corpus-wide window); every assignment pass joins the exploded
    (id, subspace, subvec) frame to the BROADCAST codebook (m·k·d_sub
    floats — trivially small at any corpus size); centroid means
    accumulate in integer micro-units so the build is bit-reproducible
    across engines and shuffle orders.  All m subspaces train in ONE
    pass per iteration (subspace is a join key, not a driver loop), so
    the iteration cost is one broadcast join + one groupBy regardless
    of m.
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    seeds = (
        corpus.select(
            F.md5(F.col(corpus_id).cast("string")).alias("_h"),
            F.col(vec_col).alias("_v"),
        )
        .orderBy("_h")
        .limit(k)
    )
    seed_rows = seeds.withColumn(
        "centroid_id", (F.row_number().over(Window.orderBy("_h")) - 1).cast("int")
    )
    codebooks = _subspaces(
        seed_rows.select("centroid_id", F.col("_v").alias("embedding")),
        "embedding", m, d_sub,
    ).select("subspace", "centroid_id", F.col("subvec").alias("centroid"))
    # r14 NB: unlike build_ivf_index's centroids, these codebooks are
    # NOT checkpointed — every consumer broadcasts the identical
    # codebook subtree, so ReuseExchange already executes it once, and
    # an eager checkpoint per iteration measured ~1.5 s SLOWER on the
    # ivfpq row (extra jobs, no recompute saved)

    # subs is re-derived by every assignment pass — DELIBERATELY not
    # checkpointed: the derivation is a columnar parquet scan + array
    # slice (cheap, prunable), while materializing the m×-exploded
    # corpus to executor-local storage costs more than the re-scan at
    # any size (measured 2× slower with a checkpoint here).  Contrast
    # the shingle/bigram frames, where the re-derivation is an
    # expensive tokenize+hash — the materialization rule keys on
    # derivation cost, not consumer count alone.
    subs = _subspaces(
        corpus.select(corpus_id, vec_col), vec_col, m, d_sub
    )

    def assign(cb: DataFrame) -> DataFrame:
        return _pq_assign(subs, cb, corpus_id)

    assignments = assign(codebooks)
    for _ in range(n_iters - 1):
        exploded = assignments.select(
            "subspace", "code", F.posexplode("subvec").alias("pos", "val")
        )
        means = (
            exploded.groupBy("subspace", "code", "pos")
            .agg(
                F.sum(
                    F.round(F.col("val").cast("double") * 1e8).cast("long")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "subspace", "code", "pos",
                (F.col("_s").cast("double") / F.col("_n") / F.lit(1e8)).alias("m"),
            )
        )
        updated = (
            means.groupBy("subspace", F.col("code").alias("centroid_id"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m.cast("float"),
                ).alias("centroid")
            )
        )
        # A centroid that loses every assignment in the mean step would
        # vanish here and leave a HOLE in the m·k codebook — the ADC
        # search (pq_topk) indexes its distance table positionally as
        # subspace·k + code, so a sparse codebook crashes the lookup or
        # silently shifts distances.  Keep empty clusters alive by
        # retaining their previous centroid (standard Lloyd's practice;
        # degenerate inputs such as constant subspaces hit this on
        # every iteration).  Both sides are m·k rows — driver-trivial.
        codebooks = (
            codebooks.alias("prev")
            .join(updated.alias("upd"), ["subspace", "centroid_id"], "left")
            .select(
                "subspace",
                "centroid_id",
                F.coalesce(F.col("upd.centroid"), F.col("prev.centroid")).alias(
                    "centroid"
                ),
            )
        )
        assignments = assign(codebooks)
    return assignments.select(corpus_id, "subspace", "code"), codebooks


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k_nn: int = 5,
    m: int = 2,
    k: int = 4,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search: per query, an m·k distance table (query subvector to
    every codebook centroid); each corpus vector's approximate distance
    is the sum of its m table entries — no corpus vector is ever read.

    The distance table is |Q|·m·k doubles — broadcast by the same
    bound that lets the queries broadcast in ``cosine_topk``.  The
    candidate scoring is then a scan of the CODES table (m
    small-int columns' worth of data per corpus row): the whole search
    touches ~1/100th the bytes of brute force at dim=64, m=2.  The
    per-row sum unrolls in subspace order (a fixed-order chain, not a
    float SUM), keeping results engine-exact.
    """
    d_sub = dim // m
    q_sub = _subspaces(
        queries.select(query_id, vec_col), vec_col, m, d_sub
    )
    dtab_long = q_sub.join(F.broadcast(codebooks), "subspace").select(
        query_id,
        (F.col("subspace") * k + F.col("centroid_id")).alias("_idx"),
        _l2sq(F.col("subvec"), F.col("centroid")).alias("_d2"),
    )
    dtab = dtab_long.groupBy(query_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_idx", "_d2"))),
            lambda s: s._d2,
        ).alias("_dt")
    )
    codes_wide = codes.groupBy(corpus_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s.code,
        ).alias("_codes")
    )
    scored = codes_wide.crossJoin(F.broadcast(dtab)).filter(
        F.col(query_id) != F.col(corpus_id)
    )
    approx = None
    for s in range(m):
        entry = F.element_at(
            F.col("_dt"),
            (F.lit(s * k) + F.element_at(F.col("_codes"), s + 1) + 1).cast("int"),
        )
        approx = entry if approx is None else approx + entry
    scored = scored.withColumn("_ad", approx)
    w = Window.partitionBy(query_id).orderBy(F.col("_ad").asc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_ad"), 6).alias("approx_dist"),
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    ivf_assignments: DataFrame,
    ivf_centroids: DataFrame,
    pq_codes: DataFrame,
    pq_codebooks: DataFrame,
    k_nn: int = 5,
    n_probe: int = 2,
    m: int = 2,
    k: int = 4,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ composition (the FAISS ``IVFx,PQy`` shape): IVF routing
    prunes WHO to score (n_probe/C of the corpus), PQ/ADC compresses
    WHAT is scored (m codes per row, corpus vectors never read).

    The probed candidate set is an equi-join of the IVF assignment
    table with the broadcast probe list, then scored purely from the
    codes table joined on ``corpus_id`` — co-partitioned narrow data
    end-to-end.  At 100 TB this is the only tier whose query-time I/O
    is independent of vector width.
    """
    d_sub = dim // m
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    probes = q.crossJoin(F.broadcast(ivf_centroids)).select(
        query_id,
        "_qv",
        "centroid_id",
        (_dot(F.col("_qv"), F.col("centroid"))
         / (_norm(F.col("_qv")) * _norm(F.col("centroid")))).alias("_csim"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("_csim").desc(), F.col("centroid_id")
    )
    probed = (
        probes.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= n_probe)
        .select(query_id, "centroid_id")
    )
    cands = ivf_assignments.select(corpus_id, "centroid_id").join(
        F.broadcast(probed), "centroid_id"
    ).filter(F.col(query_id) != F.col(corpus_id)).select(query_id, corpus_id)

    q_sub = _subspaces(queries.select(query_id, vec_col), vec_col, m, d_sub)
    dtab_long = q_sub.join(F.broadcast(pq_codebooks), "subspace").select(
        query_id,
        (F.col("subspace") * k + F.col("centroid_id")).alias("_idx"),
        _l2sq(F.col("subvec"), F.col("centroid")).alias("_d2"),
    )
    dtab = dtab_long.groupBy(query_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_idx", "_d2"))),
            lambda s: s._d2,
        ).alias("_dt")
    )
    codes_wide = pq_codes.groupBy(corpus_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s.code,
        ).alias("_codes")
    )
    scored = (
        cands.join(codes_wide, corpus_id)
        .join(F.broadcast(dtab), query_id)
    )
    approx = None
    for s in range(m):
        entry = F.element_at(
            F.col("_dt"),
            (F.lit(s * k) + F.element_at(F.col("_codes"), s + 1) + 1).cast("int"),
        )
        approx = entry if approx is None else approx + entry
    scored = scored.withColumn("_ad", approx)
    w = Window.partitionBy(query_id).orderBy(F.col("_ad").asc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_ad"), 6).alias("approx_dist"),
        )
    )


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_q",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: each embedding stores as
    ``array<tinyint>`` plus one float scale (max-abs / 127) — a 4×
    storage/IO cut for the 100 TB embedding zone, with cosine ranking
    preserved to ~1e-2 (parity-tested).  Pure array intrinsics: the
    max-abs fold and the scaled round stay in whole-stage codegen,
    zero shuffle, zero UDF.

    A zero vector quantizes to zeros with scale 0 (dequantizes back to
    exact zeros — no division-by-zero NaNs).
    """
    v = F.col(vec_col)
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.when(max_abs > 0, max_abs / F.lit(127.0)).otherwise(F.lit(0.0))

    # r14: the old withColumn pair collapsed into one projection,
    # inlining the max-abs FOLD into every element of the code
    # transform — O(dim²) folds per row.  Let-bind the float scale as
    # a transform lambda variable (evaluated once) and emit both
    # outputs through an ``inline`` barrier so downstream consumers
    # reference real attributes, never the quantization expression.
    # Identical arithmetic: the codes divide by the same float-cast
    # scale the scale column stores.
    def _pack(s: Column) -> Column:
        q = F.transform(
            v,
            lambda x: F.when(
                s > 0, F.round(x.cast("double") / s).cast("tinyint")
            ).otherwise(F.lit(0).cast("tinyint")),
        )
        return F.struct(s.alias(scale_col), q.alias(out_col))

    return df.select(
        "*", F.inline(F.transform(F.array(scale.cast("float")), _pack))
    )


def cosine_topk_int8(
    queries_q: DataFrame,
    corpus_q: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    code_col: str = "embedding_q",
) -> DataFrame:
    """Exact top-k cosine ranking over symmetric-int8 codes — the
    retrieval tier that reads ONLY the quantized zone (4× less IO than
    float32; see :func:`quantize_embeddings_int8`).

    The per-vector scales cancel out of the quantized cosine::

        cos_q8 = (s_q·s_c·Σ q_i c_i) / (s_q·√Σq_i² · s_c·√Σc_i²)
               = Σ q_i c_i / (√Σq_i² · √Σc_i²)

    so scoring touches only the tinyint codes: the dot product and
    both norms are EXACT order-free BIGINT folds, and the only float
    operations are two correctly-rounded IEEE sqrts and one division —
    bit-reproducible on any IEEE-754 engine, which is what lets the
    DuckDB oracle hash-verify an int8 index end to end.

    Scale shape mirrors :func:`cosine_topk`: queries broadcast against
    the corpus (zero corpus shuffle), norms precomputed per row (N
    integer folds, not N²), per-query top-k as one window rank with
    ``corpus_id`` as the deterministic tie-break.
    """

    def _inorm2(col: Column) -> Column:
        sq = F.transform(col, lambda x: x.cast("bigint") * x.cast("bigint"))
        return F.aggregate(sq, F.lit(0).cast("bigint"), lambda acc, v: acc + v)

    q = queries_q.select(
        F.col(query_id), F.col(code_col).alias("_qc")
    ).withColumn("_qn2", _inorm2(F.col("_qc")))
    c = corpus_q.select(
        F.col(corpus_id), F.col(code_col).alias("_cc")
    ).withColumn("_cn2", _inorm2(F.col("_cc")))
    idot = F.aggregate(
        F.zip_with(
            F.col("_qc"), F.col("_cc"),
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id) != F.col(corpus_id))
        .filter((F.col("_qn2") > 0) & (F.col("_cn2") > 0))
        .select(
            query_id,
            corpus_id,
            (
                idot.cast("double")
                / (F.sqrt(F.col("_qn2").cast("double"))
                   * F.sqrt(F.col("_cn2").cast("double")))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_q8"),
        )
    )


def dequantize_embeddings_int8(
    df: DataFrame,
    q_col: str = "embedding_q",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8` (float32 output)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda x: (x.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


def mean_pool_embeddings(
    chunks: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    out_col: str = "embedding",
    nano_units: bool = False,
) -> DataFrame:
    """Mean-pool chunk embeddings back to one vector per document —
    the standard doc-representation step after chunked embedding.

    Scale shape: ``posexplode`` to (group, pos, val), ONE groupBy on
    (group, pos) with map-side-combinable SUM/COUNT, then re-assemble
    the vector with an ordered ``collect_list`` fold — the same
    micro-pattern as the PQ codebook mean step.  Means accumulate in
    double and cast to float at the end.

    ``nano_units=True`` accumulates ``round(val·1e9)`` BIGINTs instead
    of doubles, so the per-position sum is exact and order-free (a
    float32 value times 1e9 is exact in double: 24 mantissa bits +
    ~30 bits of 1e9 < 53) and the pooled mean is the correctly-rounded
    double of an exact rational — bit-reproducible across engines,
    which is what lets the DuckDB oracle hash-verify pooled retrieval.
    """
    ex = chunks.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    if nano_units:
        means = ex.groupBy(group_col, "pos").agg(
            (
                F.sum(F.round(F.col("val").cast("double") * 1e9).cast("bigint"))
                / (F.count(F.lit(1)) * F.lit(1e9))
            ).alias("m")
        )
    else:
        means = ex.groupBy(group_col, "pos").agg(
            (F.sum(F.col("val").cast("double")) / F.count(F.lit(1))).alias("m")
        )
    return means.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.m.cast("float"),
        ).alias(out_col)
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
    nano_units: bool = False,
    weights: list[float] | None = None,
) -> DataFrame:
    """Hybrid-search fusion (Cormack et al. 2009): combine N ranked
    candidate lists (e.g. BM25 lexical + ANN semantic) by summing
    ``1 / (k + rank)`` per document.  RRF is the standard fusion
    because it needs no score calibration across retrievers — only
    ranks.

    Scale shape: union the (id, rank) lists, one groupBy on the id
    (map-side combinable), optional TakeOrdered top-n.  Ties break on
    the id for determinism.

    ``nano_units=True`` switches each contribution to the integer
    ``10^9 div (k + rank)`` (BIGINT), so the fused sum is order-free
    and engine-exact — the registry's reproducibility posture for
    float folds.  The quantization error per list is < 1e-9, far below
    any rank-separating gap of 1/(k+r) − 1/(k+r+1) for practical k.
    Output column becomes ``rrf_nano`` plus a derived ``rrf_score``
    (the nano sum scaled back, deterministic because the sum is exact).

    ``weights`` (one per list) biases the fusion toward a retriever —
    the standard weighted-RRF knob for tuning lexical vs semantic
    influence.  In nano mode weights must be integers so the sum stays
    exact; in float mode any positive floats work.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("weights must match rankings 1:1")
    if weights is not None and nano_units and any(
        w != int(w) for w in weights
    ):
        raise ValueError("nano_units fusion needs integer weights")

    def contrib(i: int):
        w = 1 if weights is None else weights[i]
        if nano_units:
            return F.expr(
                f"CAST({int(w)} AS BIGINT) * (CAST(1000000000 AS BIGINT) div "
                f"(CAST({int(k)} AS BIGINT) + CAST({rank_col} AS BIGINT)))"
            )
        return F.lit(float(w)) / (F.lit(float(k)) + F.col(rank_col).cast("double"))

    parts = [
        r.select(F.col(id_col), contrib(i).alias("_rrf"))
        for i, r in enumerate(rankings)
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    if nano_units:
        fused = allr.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum("_rrf").alias("rrf_nano"),
        ).select(
            id_col,
            "n_lists",
            "rrf_nano",
            F.round(F.col("rrf_nano") / F.lit(1e9), 9).alias("rrf_score"),
        )
        out = fused.orderBy(F.col("rrf_nano").desc(), F.col(id_col).asc())
    else:
        fused = allr.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.round(F.sum("_rrf"), 9).alias("rrf_score"),
        )
        out = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return out.limit(top_n) if top_n else out


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-distribution drift between two corpus versions,
    measured against a SHARED centroid set: assign both sides to their
    nearest centroid (the IVF routing rule) and compare per-centroid
    occupancy.  This is the health check behind frozen-centroid index
    maintenance — when new data's occupancy diverges from the
    training-time distribution, IVF recall degrades and a re-train
    (``plans/retrieval.ensure_ivf_index`` staleness rebuild) is due.

    Returns one row per centroid: exact counts, occupancy shares in
    nano units (BIGINT ``div`` — engine-exact), and the share delta.
    The summary statistic ``sum(abs(delta))/2`` is total-variation
    distance; compute it from this frame with one tiny aggregate.
    Scale shape: two broadcast-assignment passes + one C-row groupBy —
    no corpus join, no shuffle beyond the count aggregation.
    """
    NANO = 1_000_000_000

    def occupancy(df: DataFrame, name: str) -> DataFrame:
        assigned = assign_to_centroids(df, centroids, corpus_id, vec_col)
        return assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    o = occupancy(old, "n_old")
    n = occupancy(new, "n_new")
    both = (
        centroids.select("centroid_id")
        .join(o, "centroid_id", "left")
        .join(n, "centroid_id", "left")
        .fillna(0, ["n_old", "n_new"])
        # C rows (one per centroid).  Checkpoint BEFORE the totals
        # aggregate: `both` feeds the plan twice (once per the totals
        # 1-row broadcast, once as the output spine), and without the
        # cut Spark re-runs BOTH corpus assignment passes for each
        # consumer — at 100 TB that doubles the whole job (r10 plan
        # audit finding)
        .localCheckpoint()
    )
    # totals via a 1-row broadcast (the domain_stats pattern)
    totals = both.agg(
        F.sum("n_old").cast("long").alias("_to"),
        F.sum("n_new").cast("long").alias("_tn"),
    )
    return (
        both.crossJoin(F.broadcast(totals))
        .withColumn(
            "share_old_nano",
            F.expr(f"CASE WHEN _to > 0 THEN (n_old * {NANO}L) div _to ELSE 0L END"),
        )
        .withColumn(
            "share_new_nano",
            F.expr(f"CASE WHEN _tn > 0 THEN (n_new * {NANO}L) div _tn ELSE 0L END"),
        )
        .withColumn(
            "delta_nano", F.col("share_new_nano") - F.col("share_old_nano")
        )
        .select(
            "centroid_id", "n_old", "n_new",
            "share_old_nano", "share_new_nano", "delta_nano",
        )
    )


def covariance_cells(
    emb: DataFrame,
    vec_col: str = "embedding",
    quant: int = 10**6,
) -> DataFrame:
    """The oracle-able face of :func:`embedding_covariance`: the
    upper-triangle ``(i, j, s)`` cell frame with DECIMAL(38,0) sums of
    integer-quantized products — exactly what the distributed job
    computes before the driver-side collect, and exactly replayable in
    SQL (HUGEINT sums of the same products).

    Overflow safety without paying DECIMAL multiplies everywhere
    (r14): components with ``|x|·quant >= sqrt(2^63) ≈ 3.03e9`` (e.g.
    quant=1e6 with |x| > ~3037) would silently wrap a BIGINT product,
    so each ROW branches on ``max|q| < 3e9`` — the common (always, for
    unit-scale embeddings) safe branch multiplies in BIGINT and casts
    the exact product to decimal(38,0); the unsafe branch keeps the old
    decimal-operand multiply.  Both branches produce the identical
    exact integer, and the decimal(38,0) SUM is unchanged — same
    result, ~order-of-magnitude cheaper per-cell arithmetic.

    Plan shape note (r14): a single-Generate variant (per-row
    upper-triangle struct array built with nested transform/flatten)
    was tried first and measured ~1.7× SLOWER than this posexplode
    chain — higher-order functions are CodegenFallback (interpreted,
    one struct allocation per cell), while the Generate→Generate→
    Filter chain runs inside WholeStageCodegen.  The win that stayed
    is the arithmetic one above."""
    v = F.col(vec_col)
    q = F.transform(v, lambda x: F.round(x * quant).cast("long"))
    safe = F.aggregate(
        F.col("_q"),
        F.lit(True),
        lambda acc, x: acc & (F.abs(x) < F.lit(3_000_000_000)),
    )
    prod = F.when(
        F.col("_safe"), (F.col("qi") * F.col("qj")).cast("decimal(38,0)")
    ).otherwise(F.col("qi").cast("decimal(38,0)") * F.col("qj"))
    return (
        emb.select(q.alias("_q"))
        .select(F.col("_q"), safe.alias("_safe"))
        .select(F.posexplode("_q").alias("i", "qi"), F.col("_q"), F.col("_safe"))
        .select(
            "i",
            "qi",
            F.posexplode("_q").alias("j", "qj"),
            F.col("_safe"),
        )
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(prod).alias("s"))
    )


def embedding_covariance(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    quant: int = 10**6,
) -> tuple:
    """EXACT distributed second-moment statistics for an embedding
    column: ``(n, sum_q, cov_q)`` where ``sum_q[i] = Σ q_i`` and
    ``cov_q[i][j] = Σ q_i·q_j`` over integer-quantized components
    ``q = round(v·quant)``.

    The scale trick: per-row outer products explode to (i, j) cells —
    d²/row virtual rows, but Spark's partial hash aggregation folds
    them to ≤ d² rows per partition BEFORE the shuffle, so the
    exchange carries ~d² rows per partition regardless of corpus size.
    Cell sums accumulate as DECIMAL(38,0) — exact and
    order-independent (no float reduction order anywhere), so the
    statistics are bit-identical for ANY partitioning; with
    ``quant=1e6`` and unit-scale embeddings the 38-digit headroom
    absorbs ~1e14 rows per cell.  Only the upper triangle shuffles
    (j ≥ i); the mirror is reconstructed driver-side.

    Returns plain Python ``(n, sums, cov)`` (d and d×d lists of exact
    ints) — driver-sized by construction (d² cells), the same bounded
    ``collect`` class as centroid tables.
    """
    import numpy as np

    v = F.col(vec_col)
    q = F.transform(v, lambda x: F.round(x * quant).cast("long"))
    cells = covariance_cells(emb, vec_col=vec_col, quant=quant)
    sums = (
        emb.select(q.alias("_q"))
        .select(F.posexplode("_q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum(F.col("qi").cast("decimal(38,0)")).alias("s"))
    )
    n = emb.count()
    sum_vec = [0] * dim
    for r in sums.collect():
        sum_vec[r["i"]] = int(r["s"])
    cov = np.zeros((dim, dim), dtype=object)
    for r in cells.collect():
        cov[r["i"], r["j"]] = int(r["s"])
        cov[r["j"], r["i"]] = int(r["s"])
    return n, sum_vec, cov.tolist()


def embedding_pca(
    emb: DataFrame,
    k: int,
    dim: int = 64,
    vec_col: str = "embedding",
    quant: int = 10**6,
    whiten: bool = False,
    eps: float = 1e-9,
):
    """PCA components from the EXACT covariance statistics: centered
    covariance ``C = (Σqq^T − (Σq)(Σq)^T/n) / ((n−1)·quant²)`` is
    reconstructed driver-side from integers, then a d×d ``eigh``
    (driver math on an index-constant matrix — the centroid-table
    collect class).  Eigenvector SIGNS are canonicalized (largest-|x|
    component positive) so the basis is deterministic across LAPACK
    builds up to that convention.

    Returns ``(components, eigvals)``: a ``k×d`` list of float lists
    (rows = principal axes, descending eigenvalue) and the k
    eigenvalues.  ``whiten=True`` scales each axis by
    ``1/sqrt(λ+eps)`` — the SemDeDup-style conditioning that stops a
    few dominant directions from swamping cosine similarity.
    """
    import numpy as np

    n, sum_vec, cov_q = embedding_covariance(
        emb, dim=dim, vec_col=vec_col, quant=quant
    )
    if n < 2:
        raise ValueError("embedding_pca needs at least 2 rows")
    s = np.asarray(sum_vec, dtype=np.float64)
    c2 = np.asarray([[float(x) for x in row] for row in cov_q], dtype=np.float64)
    cov = (c2 - np.outer(s, s) / n) / ((n - 1) * float(quant) ** 2)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals = vals[order]
    comps = vecs[:, order].T
    for r in range(comps.shape[0]):  # sign canonicalization
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    if whiten:
        comps = comps / np.sqrt(vals + eps)[:, None]
    return [list(map(float, row)) for row in comps], [float(x) for x in vals]


def project_embeddings(
    emb: DataFrame,
    components: list,
    mean: list | None = None,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project the embedding column onto PCA axes — pure JVM: each
    output component is one ``aggregate``(zip_with) dot product
    against a literal axis (components are k×d literals, broadcast in
    the plan, no join).  ``mean`` (from ``embedding_covariance``:
    ``sum_q[i]/(n·quant)``) centers before projecting when given.
    Output is ``array<double>`` of length k — directly usable by every
    ANN/dedup/drift operator in this module.
    """
    v = F.col(vec_col)
    if mean is not None:
        v = F.zip_with(
            v,
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda x, m: x - m,
        )
    outs = []
    for axis in components:
        lit_axis = F.array(*[F.lit(float(a)) for a in axis])
        outs.append(
            F.aggregate(
                F.zip_with(v, lit_axis, lambda x, a: x * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return emb.withColumn(out_col, F.array(*outs))


def merge_covariance(stats_a: tuple, stats_b: tuple) -> tuple:
    """Merge two ``embedding_covariance`` results — the statistics are
    plain integer sums, so incremental PCA retraining is ADDITIVE:
    accumulate ``(n, Σq, Σqq^T)`` per ingest batch (or per corpus
    shard) and merge in any order with zero error; ``embedding_pca``'s
    driver math runs on the merged ints unchanged.  This is the same
    exactness contract the BM25 zone's additive integer stats carry."""
    na, sa, ca = stats_a
    nb, sb, cb = stats_b
    return (
        na + nb,
        [x + y for x, y in zip(sa, sb)],
        [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(ca, cb)],
    )
