"""Round-15 STAGED registry rows — pre-staged because their evidence
is ready now (the NOTES pre-staging recipe; the registry sits AT the
100 ceiling, so each row registers only with a funding consolidation
chosen by the session that can see the r15 tail).

* ``bloom_audit`` puts the Bloom-filter membership family
  (``operators/sketches.py::bloom_bits/bloom_pack/bloom_merge/
  bloom_probe/bloom_occupancy``) under the hard oracle.  The scale
  story is benchmark decontamination: build the filter over the small
  member set (documents with ``doc_id % 17 = 0``), broadcast the
  packed words, probe the full corpus MAP-SIDE with no join shuffle.
  The Spark side goes the long way around — per-SOURCE set-bit builds,
  per-source packs, an OR-merge down to one global filter, then the
  packed-word probe — while the oracle states the set-bit table and
  the probe verdicts directly from the md5 position arithmetic, so the
  pack/merge/probe machinery must REDISCOVER the analytic truth
  (semilattice exactness is what makes the detour lossless, pinned by
  ``tests/test_sketches.py``).

  Geometry m=512, k=3 is chosen so the probe leg is non-degenerate in
  BOTH directions at every SF (measured: 3 / 1 / 2789 false positives
  and 467 / 469 / 1916 true negatives at sf0.001 / 0.01 / 0.1) — the
  filter is genuinely approximate AND deterministically replayable:
  every decision is exact 60-bit md5 integer arithmetic mod 512, no
  float anywhere until the final occupancy estimate, whose
  (bits_set/512)^3 is an exact dyadic ratio cubed by two correctly-
  rounded multiplies (no libm pow on either engine).

* ``zorder_audit`` puts the Z-order layout family
  (``operators/layout.py::zorder_key/zorder_index``) under the hard
  oracle — every Morton key over (l_partkey, l_suppkey) plus the
  64-range skipping index (per-range counts and per-dimension min/max,
  the footer stats pruning consults).  Integer arithmetic end to end
  (affine BIGINT bins via DIV, shift/mask interleave, shifts for the
  bucket split), so the row is bit-exact with zero float boundary.

* ``hardneg_audit`` puts the batch retrieval-mining family
  (``operators/mining.py``) under the hard oracle — three training
  queries' hard negatives with analytic positives (doc_id % 13 = 0),
  replayed per query with the SAME nano-floored bm25 contribution as
  the hash-verified bm25 oracle family, the anti-join stated as id
  arithmetic and skip_top as a rank offset (see its section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"

_BLOOM_M = 512
_BLOOM_K = 3


def q_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sketches as sk
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    # the long way: per-source builds -> packs -> one OR-merge; the
    # semilattice makes this bit-identical to a single global build
    per_src = sk.bloom_pack(
        sk.bloom_bits(
            bench, "text", group_cols=["source"], m=_BLOOM_M, k=_BLOOM_K
        ),
        group_cols=["source"],
        m=_BLOOM_M,
        k=_BLOOM_K,
    )
    merged = sk.bloom_merge(per_src)
    # unpack the merged words back into bit positions (bit j of word w
    # is set iff (word >> j) & 1 = 1) — the oracle states this table
    # directly from the md5 arithmetic, so the pack/merge round trip
    # must be lossless for the leg to hash-match
    words = merged.select(F.posexplode("bloom").alias("_w", "_word"))
    bit_rows = words.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(0, 63),"
                " j -> IF(((_word >> j) & 1) = 1, _w * 64 + j, NULL)),"
                " x -> x IS NOT NULL)"
            )
        ).alias("bit")
    )
    bits = bit_rows.select(
        F.lit("bit").alias("stat"),
        F.lit(None).cast(_L).alias("doc_id"),
        F.col("bit").cast(_L).alias("bv"),
        F.lit(None).cast(_D).alias("est"),
    )
    probe = sk.bloom_probe(
        docs, "text", merged, k=_BLOOM_K
    ).select(
        F.lit("probe").alias("stat"),
        F.col("doc_id").cast(_L).alias("doc_id"),
        F.col("maybe_member").cast(_L).alias("bv"),
        F.lit(None).cast(_D).alias("est"),
    )
    occ = sk.bloom_occupancy(merged, k=_BLOOM_K).select(
        F.lit("occ").alias("stat"),
        F.lit(None).cast(_L).alias("doc_id"),
        F.col("bloom_bits_set").cast(_L).alias("bv"),
        F.col("bloom_fpp").cast(_D).alias("est"),
    )
    return bits.unionByName(probe).unionByName(occ)


SQL_BLOOM_AUDIT = f"""
WITH bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5('bloom' || g.i || '_' || d.text), 1, 15))::BIGINT
           % {_BLOOM_M} AS bit
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) g
  WHERE d.doc_id % 17 = 0 AND d.text IS NOT NULL
),
probe AS (
  SELECT d.doc_id,
         MIN(CASE WHEN ('0x' || substr(md5('bloom' || g.i || '_' || d.text),
                                       1, 15))::BIGINT % {_BLOOM_M}
                       IN (SELECT bit FROM bits)
                  THEN 1 ELSE 0 END) AS mm
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) g
  GROUP BY d.doc_id
),
occ AS (SELECT COUNT(*) AS n FROM bits)
SELECT 'bit' AS stat, CAST(NULL AS BIGINT) AS doc_id,
       CAST(bit AS BIGINT) AS bv, CAST(NULL AS DOUBLE) AS est
FROM bits
UNION ALL
SELECT 'probe', CAST(doc_id AS BIGINT), CAST(mm AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM probe
UNION ALL
SELECT 'occ', CAST(NULL AS BIGINT), CAST(n AS BIGINT),
       round((CAST(n AS DOUBLE) / {_BLOOM_M})
             * (CAST(n AS DOUBLE) / {_BLOOM_M})
             * (CAST(n AS DOUBLE) / {_BLOOM_M}), 6)
FROM occ
"""


# ---------------------------------------------------------------------------
# zorder_audit — the Z-order layout family (operators/layout.py) under
# the hard oracle.  Two legs: every row's Morton key over
# (l_partkey, l_suppkey) at 8 bits/dim (exact BIGINT affine bins over
# the global min/max, DIV integer division, shift/mask interleave),
# and the 64-range skipping index (key >> 10 buckets with per-range
# row counts and per-dimension min/max — the footer stats a pruning
# engine consults).  Everything is integer arithmetic end to end; the
# oracle replays bin, interleave, and bucket stats from the same
# min/max scalars.

_Z_BITS = 8
_Z_BUCKET_BITS = 6  # shift = 2*8 - 6 = 10


def q_zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import layout
    from .session import read_table

    line = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    cols = ["l_partkey", "l_suppkey"]
    keyed = layout.zorder_key(line, cols, bits=_Z_BITS)
    key_leg = keyed.select(
        F.lit("key").alias("stat"),
        F.col("l_orderkey").cast(_L).alias("k1"),
        F.col("l_linenumber").cast(_L).alias("k2"),
        F.col("zkey").cast(_L).alias("v1"),
        F.lit(None).cast(_L).alias("v2"),
        F.lit(None).cast(_L).alias("v3"),
        F.lit(None).cast(_L).alias("v4"),
        F.lit(None).cast(_L).alias("v5"),
    )
    idx = layout.zorder_index(
        keyed, cols, bits=_Z_BITS, bucket_bits=_Z_BUCKET_BITS
    )
    idx_leg = idx.select(
        F.lit("idx").alias("stat"),
        F.col("bucket").cast(_L).alias("k1"),
        F.lit(None).cast(_L).alias("k2"),
        F.col("n_rows").cast(_L).alias("v1"),
        F.col("min_l_partkey").cast(_L).alias("v2"),
        F.col("max_l_partkey").cast(_L).alias("v3"),
        F.col("min_l_suppkey").cast(_L).alias("v4"),
        F.col("max_l_suppkey").cast(_L).alias("v5"),
    )
    return key_leg.unionByName(idx_leg)


SQL_ZORDER_AUDIT = f"""
WITH s AS (
  SELECT MIN(l_partkey) AS lo1, MAX(l_partkey) AS hi1,
         MIN(l_suppkey) AS lo2, MAX(l_suppkey) AS hi2
  FROM lineitem
),
b AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         (l_partkey - lo1) * {1 << _Z_BITS} // (hi1 - lo1 + 1) AS b1,
         (l_suppkey - lo2) * {1 << _Z_BITS} // (hi2 - lo2 + 1) AS b2
  FROM lineitem, s
),
keyed AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         (SELECT SUM((((b1 >> CAST(j AS INT)) & 1) << CAST(2*j AS INT))
                   + (((b2 >> CAST(j AS INT)) & 1) << CAST(2*j+1 AS INT)))
          FROM range({_Z_BITS}) t(j)) AS zkey
  FROM b
)
SELECT 'key' AS stat, CAST(l_orderkey AS BIGINT) AS k1,
       CAST(l_linenumber AS BIGINT) AS k2, CAST(zkey AS BIGINT) AS v1,
       CAST(NULL AS BIGINT) AS v2, CAST(NULL AS BIGINT) AS v3,
       CAST(NULL AS BIGINT) AS v4, CAST(NULL AS BIGINT) AS v5
FROM keyed
UNION ALL
SELECT 'idx', CAST(zkey >> {2 * _Z_BITS - _Z_BUCKET_BITS} AS BIGINT),
       CAST(NULL AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(MIN(l_partkey) AS BIGINT), CAST(MAX(l_partkey) AS BIGINT),
       CAST(MIN(l_suppkey) AS BIGINT), CAST(MAX(l_suppkey) AS BIGINT)
FROM keyed
GROUP BY zkey >> {2 * _Z_BITS - _Z_BUCKET_BITS}
"""


STAGED_QUERIES = {
    "bloom_audit": q_bloom_audit,
    "zorder_audit": q_zorder_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "bloom_audit": SQL_BLOOM_AUDIT,
        "zorder_audit": SQL_ZORDER_AUDIT,
        "hardneg_audit": SQL_HARDNEG_AUDIT,
        "annfam_audit": _sql_annfam_audit(),
        "trainprep_audit": _sql_trainprep_audit(),
        "qualfilter_audit": _sql_qualfilter_audit(),
    }


# funding consolidation chosen at r14/r15 close (see module docstring)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}


# ---------------------------------------------------------------------------
# hardneg_audit — the batch retrieval-mining family
# (operators/mining.py) under the hard oracle.  Three fixed training
# queries mine hard negatives over documents with ANALYTIC positives
# (doc_id % 13 = 0): per-query tf/df/saturation replayed with the SAME
# nano-floored contribution as the hash-verified bm25 oracle family
# (registry_text._bm25_sql), positives dropped by id arithmetic before
# ranking, skip_top replayed as a rank offset.  The operator's
# anti-join + per-query windows must rediscover the oracle's
# arithmetic statement of the result.

_HN_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("spark", "window"),
    2: ("merge", "join"),
    3: ("stream", "state", "spark"),
}
_HN_K = 8
_HN_SKIP = 2
_HN_POOL = 200
_HN_TOK = r"string_split_regex(trim(text), '\s+')"


def q_hardneg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import mining
    from .session import read_table

    corpus = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(
        [(qid, " ".join(ts)) for qid, ts in sorted(_HN_QUERIES.items())],
        "query_id long, query_text string",
    )
    positives = (
        corpus.filter(F.col("doc_id") % 13 == 0)
        .crossJoin(queries.select("query_id"))
        .select("query_id", "doc_id")
    )
    out = mining.mine_hard_negatives(
        corpus,
        queries,
        positives,
        k=_HN_K,
        skip_top=_HN_SKIP,
        pool_depth=_HN_POOL,
    )
    return out.select(
        F.col("query_id").cast(_L).alias("query_id"),
        F.col("doc_id").cast(_L).alias("doc_id"),
        F.col("n_terms_hit").cast(_L).alias("n_terms_hit"),
        F.col("score").cast(_D).alias("score"),
        F.col("neg_rank").cast(_L).alias("neg_rank"),
    )


def _hardneg_sql() -> str:
    k1, b = 1.2, 0.75
    legs = []
    for qid, terms in sorted(_HN_QUERIES.items()):
        tf_defs = ", ".join(
            f"len(list_filter({_HN_TOK}, x -> x = '{t}')) AS tf{i}"
            for i, t in enumerate(terms)
        )
        df_defs = ", ".join(
            f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS df{i}"
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
            f" + {b!r} * dl / avgdl))) * 1000000000.0) AS BIGINT)"
            f" ELSE 0 END)"
            for i in range(len(terms))
        )
        legs.append(f"""
          SELECT {qid} AS query_id, doc_id, {hit_sum} AS n_terms_hit,
                 {contrib} AS sq
          FROM (SELECT doc_id, len({_HN_TOK}) AS dl, {tf_defs}
                FROM documents) base,
               (SELECT SUM(dl) / COUNT(*) AS avgdl,
                       CAST(COUNT(*) AS DOUBLE) AS n, {df_defs}
                FROM (SELECT len({_HN_TOK}) AS dl, {tf_defs}
                      FROM documents)) stats
        """)
    union = " UNION ALL ".join(legs)
    return f"""
WITH scored AS ({union}),
pool AS (
  SELECT query_id, doc_id, n_terms_hit,
         ROUND(CAST(sq AS DOUBLE) / 1000000000.0, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sq DESC, doc_id ASC) AS rk
  FROM scored WHERE n_terms_hit > 0
),
deep AS (SELECT * FROM pool WHERE rk <= {_HN_POOL}),
neg AS (
  SELECT query_id, doc_id, n_terms_hit, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS nr
  FROM deep WHERE doc_id % 13 <> 0
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
       CAST(score AS DOUBLE) AS score,
       CAST(nr - {_HN_SKIP} AS BIGINT) AS neg_rank
FROM neg WHERE nr > {_HN_SKIP} AND nr <= {_HN_SKIP + _HN_K}
"""


SQL_HARDNEG_AUDIT = _hardneg_sql()

STAGED_QUERIES["hardneg_audit"] = q_hardneg_audit


# ---------------------------------------------------------------------------
# The THREE funding consolidations, chosen at r13 close with sight of
# the r15 rotating-in set (VERDICT r12 Next #3: "choose and stage the
# three r15 funding consolidations now").  Every leg sits in the r13
# HEAD — which rests as the r14 tail and rotates into the r15 head —
# so each union is made WITHIN r15's rotating-in set, the r10–r13
# precedent.  Each union calls the ORIGINAL query function verbatim
# and wraps the ORIGINAL SQL in CTEs, so all six operators stay
# hash-verified and drift is impossible.  Arithmetic: r15 head =
# 50 tail − 6 legs + 3 unions + 3 funded new rows (bloom_audit,
# zorder_audit, hardneg_audit) = 50; registry stays 100.
#
# * ``annfam_audit`` = ``ann_audit`` + ``ivf_audit``: the two ANN
#   audit unions (brute-force cosine + PQ/ADC; IVF + IVF-PQ) — the
#   whole approximate-nearest-neighbor family in one row.  Their stat
#   tags are already disjoint ('cosine'/'pq' vs 'ivf'/'ivfpq').
# * ``trainprep_audit`` = ``corpus_shuffle`` + ``train_shards``: the
#   two training-layout rows (deterministic corpus shuffle; token-
#   budget shard assignment over the same shuffle order).
# * ``qualfilter_audit`` = ``decontamination`` + ``repetition_filter``:
#   the two per-document quality-gate rows (benchmark n-gram overlap;
#   top/dup n-gram repetition fractions).


def q_annfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_audit import q_ann_audit
    from .registry_staged_r11 import q_ivf_audit

    a = q_ann_audit(spark, sf_dir).select(
        F.col("stat").cast("string").alias("stat"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").cast("double").alias("v"),
    )
    b = q_ivf_audit(spark, sf_dir).select(
        F.col("stat").cast("string").alias("stat"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("v").cast("double").alias("v"),
    )
    return a.unionByName(b)


def _sql_annfam_audit() -> str:
    from .registry_audit import _sql_ann_audit
    from .registry_staged_r11 import _sql_ivf_audit

    return f"""
WITH a AS ({_sql_ann_audit()}),
b AS ({_sql_ivf_audit()})
SELECT stat, CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS INTEGER) AS rank, CAST(score AS DOUBLE) AS v
FROM a
UNION ALL
SELECT stat, CAST(query_id AS BIGINT), CAST(neighbor_id AS BIGINT),
       CAST(rank AS INTEGER), CAST(v AS DOUBLE)
FROM b
"""


def q_trainprep_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_corpus_shuffle
    from .registry_staged import STAGED_QUERIES as _r9

    a = q_corpus_shuffle(spark, sf_dir).select(
        F.lit("shuffle").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("shuffle_pos").cast("long").alias("pos"),
        F.lit(None).cast("long").alias("n_tok"),
        F.lit(None).cast("long").alias("shard_id"),
    )
    b = _r9["train_shards"](spark, sf_dir).select(
        F.lit("shards").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("shuffle_pos").cast("long").alias("pos"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("shard_id").cast("long").alias("shard_id"),
    )
    return a.unionByName(b)


def _sql_trainprep_audit() -> str:
    from .registry_curation import SQL_CORPUS_SHUFFLE
    from .registry_staged import SQL_TRAIN_SHARDS

    return f"""
WITH a AS ({SQL_CORPUS_SHUFFLE}),
b AS ({SQL_TRAIN_SHARDS})
SELECT 'shuffle' AS stat, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(shuffle_pos AS BIGINT) AS pos, CAST(NULL AS BIGINT) AS n_tok,
       CAST(NULL AS BIGINT) AS shard_id
FROM a
UNION ALL
SELECT 'shards', CAST(doc_id AS BIGINT), CAST(shuffle_pos AS BIGINT),
       CAST(n_tok AS BIGINT), CAST(shard_id AS BIGINT)
FROM b
"""


def q_qualfilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import SPARK_QUERIES as _text

    a = _text["decontamination"](spark, sf_dir).select(
        F.lit("decontam").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").cast("string").alias("k1"),
        F.col("n_overlap").cast("long").alias("n"),
        F.col("contaminated").cast("boolean").alias("flag"),
        *[F.lit(None).cast("double").alias(c) for c in (
            "v1", "v2", "v3", "v4", "v5", "v6",
        )],
    )
    b = _text["repetition_filter"](spark, sf_dir).select(
        F.lit("repetition").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("k1"),
        F.lit(None).cast("long").alias("n"),
        F.col("keep").cast("boolean").alias("flag"),
        F.col("top1gram_frac").cast("double").alias("v1"),
        F.col("dup1gram_frac").cast("double").alias("v2"),
        F.col("top2gram_frac").cast("double").alias("v3"),
        F.col("dup2gram_frac").cast("double").alias("v4"),
        F.col("top3gram_frac").cast("double").alias("v5"),
        F.col("dup3gram_frac").cast("double").alias("v6"),
    )
    return a.unionByName(b)


def _sql_qualfilter_audit() -> str:
    from .registry_text import SQL_DECONTAMINATION, SQL_REPETITION_FILTER

    return f"""
WITH a AS ({SQL_DECONTAMINATION}),
b AS ({SQL_REPETITION_FILTER})
SELECT 'decontam' AS stat, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(lang AS VARCHAR) AS k1, CAST(n_overlap AS BIGINT) AS n,
       CAST(contaminated AS BOOLEAN) AS flag,
       CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4,
       CAST(NULL AS DOUBLE) AS v5, CAST(NULL AS DOUBLE) AS v6
FROM a
UNION ALL
SELECT 'repetition', CAST(doc_id AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(keep AS BOOLEAN),
       CAST(top1gram_frac AS DOUBLE), CAST(dup1gram_frac AS DOUBLE),
       CAST(top2gram_frac AS DOUBLE), CAST(dup2gram_frac AS DOUBLE),
       CAST(top3gram_frac AS DOUBLE), CAST(dup3gram_frac AS DOUBLE)
FROM b
"""


STAGED_QUERIES["annfam_audit"] = q_annfam_audit
STAGED_QUERIES["trainprep_audit"] = q_trainprep_audit
STAGED_QUERIES["qualfilter_audit"] = q_qualfilter_audit

STAGED_REPLACES["annfam_audit"] = ("ann_audit", "ivf_audit")
STAGED_REPLACES["trainprep_audit"] = ("corpus_shuffle", "train_shards")
STAGED_REPLACES["qualfilter_audit"] = ("decontamination", "repetition_filter")
