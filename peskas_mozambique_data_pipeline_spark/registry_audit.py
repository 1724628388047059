"""Round-9 registry rows.

Two kinds of row live here:

**Rotation-window union rows** — same-family pairs of long-green
registered queries merged into ONE audit row each (the
``dup_span_audit`` / ``sketch_audit`` / ``ts_audit`` precedent).  Both
operators stay fully hash-verified: the union leg is the ORIGINAL
registered query function called verbatim, its output normalized onto
a shared schema with a ``stat`` discriminator, and the oracle wraps
the ORIGINAL oracle SQL in a CTE the same way — any future edit to a
leg flows into the union automatically, so staged-vs-registered drift
is impossible.  Why now: the r8 tail (50 queries, last driver-green in
r7) must rotate into the r9 driver window en bloc, and the r9 head
also needs slots for the staged consolidations plus the three new
operator rows below; merging within the rotating-in set is the only
move that keeps every query ≤1 round driver-stale (see NOTES "r9
window arithmetic").

**New operator rows** (VERDICT r8 Next #2) — first hard driver rows
for the round-8 crawl/classifier/cross-corpus surface:

* ``url_dedup`` — canonicalization + URL-keyed dedup + registrable
  domain over a deterministically synthesized URL column (the
  documents table has no URL field; the generator covers scheme
  collapse, www/port strip, tracking-param drop, param sort, trailing
  slash, second-level public suffixes and malformed URLs).  The
  oracle derives the canonical form analytically from the generator —
  ground truth, independent of ``parse_url``.
* ``classifier_score`` — hashed linear scoring of every document
  under a model whose Naive-Bayes fit is replayed DRIVER-SIDE in pure
  Python from exact integer counts over a fixed embedded training
  set; the nano-quantized integer weights are shared literals in the
  Spark plan and the SQL, so ``ln`` never enters the cross-engine
  comparison (VERDICT r8 "what's wrong" #3).  Feature hash is the
  md5 variant (engine-portable); the xxhash64 production tier keeps
  pytest parity coverage.
* ``cross_corpus`` — NEW×REF LSH near-dup probe (new shard =
  ``doc_id % 10 = 0`` slice vs the rest as reference); the oracle
  replays shingle hashing, MinHash banding, the NEW×REF bucket join,
  exact Jaccard and the (jaccard desc, ref_id asc) best-match pick.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import web as web_ops
from .operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P
from .session import read_table

_S = "string"
_L = "long"
_D = "double"


def _null(t: str):
    return F.lit(None).cast(t)


# ---------------------------------------------------------------------------
# set_ops_audit = semi_anti (U1/J6/J7) + except_keys (U2): both are
# order-key set-membership cohort counts over orders×customer.


def q_set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import q_semi_anti
    from .registry_misc import q_except_keys

    a = q_semi_anti(spark, sf_dir).select(
        F.lit("semi_anti").alias("stat"),
        "c_mktsegment",
        "cohort",
        F.col("n_customers").cast(_L).alias("n"),
    )
    b = q_except_keys(spark, sf_dir).select(
        F.lit("except").alias("stat"),
        "c_mktsegment",
        _null(_S).alias("cohort"),
        F.col("n_lapsed").cast(_L).alias("n"),
    )
    return a.unionByName(b)


def _sql_set_ops_audit() -> str:
    from .registry import SQL_SEMI_ANTI
    from .registry_misc import SQL_EXCEPT_KEYS

    return f"""
WITH a AS ({SQL_SEMI_ANTI}),
b AS ({SQL_EXCEPT_KEYS})
SELECT 'semi_anti' AS stat, c_mktsegment, cohort, CAST(n_customers AS BIGINT) AS n FROM a
UNION ALL
SELECT 'except', c_mktsegment, CAST(NULL AS VARCHAR), CAST(n_lapsed AS BIGINT) FROM b
"""


# ---------------------------------------------------------------------------
# format_audit = string_ops (P10/P11) + iso_format (D6): both are pure
# formatting/parsing expression batteries.


def q_format_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_iso_format, q_string_ops

    a = q_string_ops(spark, sf_dir).select(
        F.lit("string").alias("stat"),
        F.col("c_custkey").cast(_S).alias("key"),
        F.col("name_prefix").alias("s1"),
        F.col("digits").alias("s2"),
        F.col("segment_label").alias("s3"),
        F.col("segment_key").alias("s4"),
        F.col("name_number").cast(_L).alias("n1"),
        F.col("name_len").cast(_L).alias("n2"),
    )
    b = q_iso_format(spark, sf_dir).select(
        F.lit("iso").alias("stat"),
        F.col("o_orderpriority").alias("key"),
        F.col("first_order").alias("s1"),
        F.col("last_order").alias("s2"),
        _null(_S).alias("s3"),
        _null(_S).alias("s4"),
        F.col("n_orders").cast(_L).alias("n1"),
        _null(_L).alias("n2"),
    )
    return a.unionByName(b)


def _sql_format_audit() -> str:
    from .registry_misc import SQL_ISO_FORMAT, SQL_STRING_OPS

    return f"""
WITH a AS ({SQL_STRING_OPS}),
b AS ({SQL_ISO_FORMAT})
SELECT 'string' AS stat, CAST(c_custkey AS VARCHAR) AS key,
       name_prefix AS s1, digits AS s2, segment_label AS s3, segment_key AS s4,
       CAST(name_number AS BIGINT) AS n1, CAST(name_len AS BIGINT) AS n2
FROM a
UNION ALL
SELECT 'iso', o_orderpriority, first_order, last_order,
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(n_orders AS BIGINT), CAST(NULL AS BIGINT)
FROM b
"""


# ---------------------------------------------------------------------------
# window_audit = running_total (cumulative/lag frames) + pct_of_group
# (W6 partition-total share): the two window-function families over the
# orders/lineitem star.


def q_window_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_pct_of_group, q_running_total

    a = q_running_total(spark, sf_dir).select(
        F.lit("running").alias("stat"),
        "n_name",
        F.date_format("month", "yyyy-MM-dd").alias("k"),
        F.col("monthly_revenue").alias("v1"),
        F.col("running_revenue").alias("v2"),
        F.col("mom_delta").alias("v3"),
    )
    b = q_pct_of_group(spark, sf_dir).select(
        F.lit("pct").alias("stat"),
        "n_name",
        F.col("p_brand").alias("k"),
        F.col("brand_revenue").alias("v1"),
        F.col("pct_of_nation").alias("v2"),
        _null(_D).alias("v3"),
    )
    return a.unionByName(b)


def _sql_window_audit() -> str:
    from .registry_misc import SQL_PCT_OF_GROUP, SQL_RUNNING_TOTAL

    return f"""
WITH a AS ({SQL_RUNNING_TOTAL}),
b AS ({SQL_PCT_OF_GROUP})
SELECT 'running' AS stat, n_name, strftime(month, '%Y-%m-%d') AS k,
       monthly_revenue AS v1, running_revenue AS v2, mom_delta AS v3
FROM a
UNION ALL
SELECT 'pct', n_name, p_brand, brand_revenue, pct_of_nation, CAST(NULL AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# split_mix_audit = data_split (md5-bucketed train/val/test) +
# sample_mix (deterministic stratified sampling): the two md5-keyed
# corpus selection gates over documents.


def q_split_mix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_data_split
    from .registry_text import q_sample_mix

    a = q_data_split(spark, sf_dir).select(
        F.lit("split").alias("stat"),
        "lang",
        F.col("split").alias("k"),
        F.col("n_docs").cast(_L).alias("n"),
        _null(_D).alias("est_total"),
        _null(_L).alias("first_doc"),
        _null(_L).alias("last_doc"),
    )
    b = q_sample_mix(spark, sf_dir).select(
        F.lit("sample").alias("stat"),
        "lang",
        _null(_S).alias("k"),
        F.col("n_sampled").cast(_L).alias("n"),
        "est_total",
        F.col("first_doc").cast(_L).alias("first_doc"),
        F.col("last_doc").cast(_L).alias("last_doc"),
    )
    return a.unionByName(b)


def _sql_split_mix_audit() -> str:
    from .registry_curation import SQL_DATA_SPLIT
    from .registry_text import SQL_SAMPLE_MIX

    return f"""
WITH a AS ({SQL_DATA_SPLIT}),
b AS ({SQL_SAMPLE_MIX})
SELECT 'split' AS stat, lang, split AS k, CAST(n_docs AS BIGINT) AS n,
       CAST(NULL AS DOUBLE) AS est_total,
       CAST(NULL AS BIGINT) AS first_doc, CAST(NULL AS BIGINT) AS last_doc
FROM a
UNION ALL
SELECT 'sample', lang, CAST(NULL AS VARCHAR), CAST(n_sampled AS BIGINT),
       est_total, CAST(first_doc AS BIGINT), CAST(last_doc AS BIGINT)
FROM b
"""


# ---------------------------------------------------------------------------
# rank_audit = rank_inference (M3 regex rank classes) + rank_lookup
# (J9 rank-dependent lookup routing): the two halves of the
# reference's taxa rank machinery, both over part.


def q_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_misc import q_rank_inference, q_rank_lookup

    a = q_rank_inference(spark, sf_dir).select(
        F.lit("infer").alias("stat"),
        F.col("rank").alias("k1"),
        F.col("p_brand").alias("k2"),
        _null(_L).alias("part_key"),
        F.col("n_parts").cast(_L).alias("n"),
    )
    b = q_rank_lookup(spark, sf_dir).select(
        F.lit("lookup").alias("stat"),
        F.col("route").alias("k1"),
        F.col("lookup_label").alias("k2"),
        F.col("p_partkey").cast(_L).alias("part_key"),
        _null(_L).alias("n"),
    )
    return a.unionByName(b)


def _sql_rank_audit() -> str:
    from .registry_misc import SQL_RANK_INFERENCE, SQL_RANK_LOOKUP

    return f"""
WITH a AS ({SQL_RANK_INFERENCE}),
b AS ({SQL_RANK_LOOKUP})
SELECT 'infer' AS stat, rank AS k1, p_brand AS k2,
       CAST(NULL AS BIGINT) AS part_key, CAST(n_parts AS BIGINT) AS n
FROM a
UNION ALL
SELECT 'lookup', route, lookup_label, CAST(p_partkey AS BIGINT),
       CAST(NULL AS BIGINT)
FROM b
"""


# ---------------------------------------------------------------------------
# ann_audit = ann_cosine (brute-force exact tier) + ann_pq (PQ/ADC
# compressed tier): the two ends of the ANN accuracy/memory ladder on
# one row; the middle tiers keep their own rows (ann_ivf, ann_ivfpq,
# ann_lsh, ann_int8).


def q_ann_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_ann_pq
    from .registry_text import q_ann_cosine

    a = q_ann_cosine(spark, sf_dir).select(
        F.lit("cosine").alias("stat"),
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("cosine_sim").alias("score"),
    )
    b = q_ann_pq(spark, sf_dir).select(
        F.lit("pq").alias("stat"),
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("approx_dist").alias("score"),
    )
    return a.unionByName(b)


def _sql_ann_audit() -> str:
    from .registry_curation import SQL_ANN_PQ
    from .registry_text import SQL_ANN_COSINE

    return f"""
WITH a AS ({SQL_ANN_COSINE}),
b AS ({SQL_ANN_PQ})
SELECT 'cosine' AS stat, query_id, neighbor_id,
       CAST(rank AS INTEGER) AS rank, cosine_sim AS score
FROM a
UNION ALL
SELECT 'pq', query_id, neighbor_id, CAST(rank AS INTEGER), approx_dist
FROM b
"""


# ---------------------------------------------------------------------------
# reshape_audit = unpivot_metrics (R1/R8 wide→long) + pivot_status
# (R2 long→wide): the two reshape directions on one row.


def q_reshape_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import q_pivot_status, q_unpivot_metrics

    a = q_unpivot_metrics(spark, sf_dir).select(
        F.lit("unpivot").alias("stat"),
        F.date_format("month", "yyyy-MM-dd").alias("k1"),
        F.col("metric_type").alias("k2"),
        F.col("metric_total").alias("v"),
        F.col("n_values").cast(_L).alias("n1"),
        _null(_L).alias("n2"),
        _null(_L).alias("n3"),
    )
    b = q_pivot_status(spark, sf_dir).select(
        F.lit("pivot").alias("stat"),
        F.col("n_name").alias("k1"),
        _null(_S).alias("k2"),
        _null(_D).alias("v"),
        F.col("status_F").cast(_L).alias("n1"),
        F.col("status_O").cast(_L).alias("n2"),
        F.col("status_P").cast(_L).alias("n3"),
    )
    return a.unionByName(b)


def _sql_reshape_audit() -> str:
    from .registry import SQL_PIVOT_STATUS, SQL_UNPIVOT_METRICS

    return f"""
WITH a AS ({SQL_UNPIVOT_METRICS}),
b AS ({SQL_PIVOT_STATUS})
SELECT 'unpivot' AS stat, strftime(month, '%Y-%m-%d') AS k1, metric_type AS k2,
       metric_total AS v, CAST(n_values AS BIGINT) AS n1,
       CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3
FROM a
UNION ALL
SELECT 'pivot', n_name, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
       CAST(status_F AS BIGINT), CAST(status_O AS BIGINT), CAST(status_P AS BIGINT)
FROM b
"""


# ---------------------------------------------------------------------------
# aug_audit = fim_audit + span_audit (both staged in registry_staged
# with two-scale-factor oracle evidence): the two augmentation
# transforms over one documents scan — registered as ONE union row from
# the start because the r9 window has exactly one head slot for the
# pair (the consolidation the r8 VERDICT pre-noted for r10, pulled
# forward by the rotation arithmetic).


def q_aug_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import augment as aug_ops
    from .registry_staged import _FIM_RATE, _FIM_SALT, _SPAN_LEN, _SPAN_N, _SPAN_SALT

    # round-robin spread BEFORE the checkpoint (r14, the audio_fp/
    # main_content placement rule): a one-file corpus checkpoints as a
    # single partition, so both legs' per-row token-slice work ran in
    # ONE task each; spread blocks let fim + span run across every
    # core.  Measured ckpt 1.26s -> spread_ckpt 0.84s warm total.
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    fim = aug_ops.fim_transform(
        docs, rate=_FIM_RATE, salt=_FIM_SALT, out_col="aug_text"
    ).select(
        F.lit("fim").alias("stat"),
        "doc_id",
        F.col("fim_applied").alias("applied"),
        F.col("aug_text").alias("s1"),
        _null(_S).alias("s2"),
    )
    span = aug_ops.span_corrupt(
        docs, n_spans=_SPAN_N, span_len=_SPAN_LEN, salt=_SPAN_SALT
    ).select(
        F.lit("span").alias("stat"),
        "doc_id",
        F.col("corrupt_applied").alias("applied"),
        F.col("inputs").alias("s1"),
        F.col("targets").alias("s2"),
    )
    return fim.unionByName(span)


def _sql_aug_audit() -> str:
    from .registry_staged import SQL_FIM_AUDIT, SQL_SPAN_AUDIT

    return f"""
WITH fim AS ({SQL_FIM_AUDIT}),
span AS ({SQL_SPAN_AUDIT})
SELECT 'fim' AS stat, doc_id, fim_applied AS applied, aug_text AS s1,
       CAST(NULL AS VARCHAR) AS s2
FROM fim
UNION ALL
SELECT 'span', doc_id, corrupt_applied, inputs, targets
FROM span
"""


# ---------------------------------------------------------------------------
# url_dedup — the crawl front door under the hard oracle.  URLs are
# synthesized deterministically from doc_id (the harness documents
# table has no URL column): blocks of 4 consecutive ids share one page
# in scheme/www/tracking-param/param-order/trailing-slash variants
# (v = id%4 ∈ {0,1,2} collapse to one canonical key, v=3 is a
# query-less sibling), hosts rotate through plain / co.uk / com.au
# suffixes, and id%97==0 rows are malformed ("not a url …") to
# exercise the NULL-canonical singleton path.  Winner per key =
# highest n_chars, ties to smallest doc_id.  The oracle computes the
# canonical form analytically from the same generator — ground truth
# independent of parse_url.

_URL_GEN = """
  CASE WHEN doc_id % 97 = 0 THEN concat('not a url ', cast(doc_id as string))
  ELSE concat(
    CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END, '://',
    CASE WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END,
    CASE CAST((doc_id div 4) % 3 AS INT)
      WHEN 0 THEN concat('s', cast((doc_id div 4) % 6 as string), '.example.com')
      WHEN 1 THEN concat('s', cast((doc_id div 4) % 6 as string), '.example.co.uk')
      ELSE concat('s', cast((doc_id div 4) % 6 as string), '.blog.example.com.au')
    END,
    '/p/', cast(doc_id div 4 as string),
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '?b=2&a=1'
      WHEN 1 THEN '?a=1&b=2'
      WHEN 2 THEN '?utm_source=x&a=1&b=2'
      ELSE '/'
    END)
  END
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_GEN)
    )
    out = web_ops.url_dedup(
        docs, url_col="url", id_col="doc_id", score_col="n_chars"
    )
    return out.select(
        "doc_id",
        "canonical_url",
        F.col("n_url_dups").cast(_L).alias("n_url_dups"),
        "is_url_canonical",
        web_ops.registrable_domain(web_ops.host_of("url")).alias("reg_domain"),
    )


SQL_URL_DEDUP = """
WITH u AS (
  SELECT doc_id, n_chars,
         (doc_id % 97 = 0) AS bad,
         doc_id // 4 AS page, (doc_id // 4) % 6 AS g, doc_id % 4 AS v
  FROM documents
),
c AS (
  SELECT doc_id, n_chars,
         CASE WHEN bad THEN NULL ELSE
           concat(
             CASE WHEN page % 3 = 0 THEN 's' || CAST(g AS VARCHAR) || '.example.com'
                  WHEN page % 3 = 1 THEN 's' || CAST(g AS VARCHAR) || '.example.co.uk'
                  ELSE 's' || CAST(g AS VARCHAR) || '.blog.example.com.au' END,
             '/p/', CAST(page AS VARCHAR),
             CASE WHEN v IN (0, 1, 2) THEN '?a=1&b=2' ELSE '' END)
         END AS canonical_url,
         CASE WHEN bad THEN NULL
              WHEN page % 3 = 0 THEN 'example.com'
              WHEN page % 3 = 1 THEN 'example.co.uk'
              ELSE 'example.com.au' END AS reg_domain
  FROM u
),
k AS (
  SELECT *,
         COALESCE(canonical_url, '_noUrl_' || CAST(doc_id AS VARCHAR)) AS key
  FROM c
),
w AS (
  SELECT doc_id, canonical_url, reg_domain,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_url_dups,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY n_chars DESC, doc_id) AS rk
  FROM k
)
SELECT doc_id, canonical_url, n_url_dups, (rk = 1) AS is_url_canonical, reg_domain
FROM w
"""


# ---------------------------------------------------------------------------
# classifier_score — hashed linear classifier inference under the hard
# oracle.  The Naive-Bayes fit runs ONCE, driver-side, in pure Python,
# over the fixed labeled training set below: exact integer token
# counts → nano-quantized log-odds weights.  Both engines receive the
# SAME integer weight literals, so the only arithmetic compared
# cross-engine is tokenize → md5-hash → exact BIGINT weight sums →
# one division (all deterministic); `ln` never enters the comparison.
# The in-engine fit (classifier.fit_hashed_nb) is pinned to this
# Python twin by tests/test_classifier.py within 1 nano-ulp.

_CLF_DIM = 4096
_CLF_ALPHA = 1.0
# balanced classes => class prior ratio is 1 => bias_nano = 0 exactly,
# independent of rounding mode.  Vocabulary deliberately overlaps the
# harness documents' query-engine wordlist so scores spread.
_CLF_TRAIN: tuple[tuple[int, str], ...] = (
    (1, "the query plan joins the sorted table and streams each row"),
    (1, "a merge join reads the sorted key column and the filter prunes"),
    (1, "the scan reads the column data and the window sorts each group"),
    (1, "a hash join builds a table and probes each key in the stream"),
    (1, "the agg groups the data by key and sums the value column"),
    (1, "a sort merge join shuffles the row data on the join key"),
    (1, "the filter drops each row and the query reads the small table"),
    (1, "a batch stream writes the part data to the big sorted table"),
    (0, "buy cheap deals now click here free offer win big prize today"),
    (0, "best price sale free shipping click now limited offer deal"),
    (0, "win cash now free spins click the banner claim your prize"),
    (0, "cheap pills best deals order now free bonus click to win"),
    (0, "exclusive offer buy now sale ends today free gift click here"),
    (0, "hot singles near you click now free trial best value deal"),
    (0, "earn money fast work from home free signup click the link"),
    (0, "lowest price guaranteed buy cheap now free coupon win daily"),
)


def _bpe_ish_py(text: str) -> list[str]:
    """Python twin of operators.text.bpe_ish_tokens (letter runs, digit
    runs, single punctuation) — used only inside the driver-side fit,
    where both engines inherit its output as shared literals."""
    spaced = re.sub(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", r" \1 ", text)
    return [t for t in re.split(r"\s+", spaced.strip()) if t]


def _md5_feature_py(token: str, dim: int = _CLF_DIM) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % dim


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


@lru_cache(maxsize=1)
def clf_model() -> tuple[tuple[tuple[int, int], ...], int]:
    """((feature, w_nano), ...) sorted by feature, plus bias_nano —
    the pure-Python Naive-Bayes fit over _CLF_TRAIN (exact integer
    counts; ln runs here once, never in either engine)."""
    c1: Counter[int] = Counter()
    c0: Counter[int] = Counter()
    t1 = t0 = d1 = 0
    for y, text in _CLF_TRAIN:
        feats = [_md5_feature_py(t) for t in _bpe_ish_py(text)]
        if y == 1:
            d1 += 1
            t1 += len(feats)
            c1.update(feats)
        else:
            t0 += len(feats)
            c0.update(feats)
    d = len(_CLF_TRAIN)
    bias = _round_half_away(
        math.log((d1 + _CLF_ALPHA) / (d - d1 + _CLF_ALPHA)) * 1e9
    )
    weights = {}
    for f in set(c1) | set(c0):
        w = math.log((c1[f] + _CLF_ALPHA) / (t1 + _CLF_ALPHA * _CLF_DIM)) - math.log(
            (c0[f] + _CLF_ALPHA) / (t0 + _CLF_ALPHA * _CLF_DIM)
        )
        weights[f] = _round_half_away(w * 1e9)
    return tuple(sorted(weights.items())), bias


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import classifier as clf

    weights, bias = clf_model()
    wdf = spark.createDataFrame(list(weights), "feature long, w_nano long")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = clf.score_hashed_linear(
        docs, wdf, dim=_CLF_DIM, bias_nano=bias, feature_hash="md5"
    )
    return scored.select(
        "doc_id", "score", (F.col("score") > 0).alias("is_positive")
    )


def _sql_classifier_score() -> str:
    weights, bias = clf_model()
    values = ", ".join(f"({f}, {w})" for f, w in weights)
    return f"""
WITH w (feature, w_nano) AS (VALUES {values}),
tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(regexp_replace(text,
             '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', ' \\1 ', 'g')), '\\s+')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_CLF_DIM} AS feature,
         COUNT(*) AS n
  FROM tok WHERE tok <> '' GROUP BY doc_id, feature
),
s AS (
  SELECT t.doc_id, CAST(SUM(t.n * w.w_nano) AS BIGINT) AS sn
  FROM tf t JOIN w ON t.feature = w.feature GROUP BY t.doc_id
)
SELECT d.doc_id,
       (COALESCE(s.sn, 0) + {bias}) / 1000000000.0 AS score,
       ((COALESCE(s.sn, 0) + {bias}) > 0) AS is_positive
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


# ---------------------------------------------------------------------------
# cross_corpus — NEW×REF near-dup probe: the incoming shard
# (doc_id % 10 = 0) probed against the rest of the corpus as the
# reference.  The oracle replays shingle hashing, MinHash banding, the
# NEW×REF band-bucket join, exact Jaccard over the shared 32-bit
# shingle-hash sets, the >= threshold filter on the ROUNDED jaccard
# (mirroring the operator), and the (jaccard desc, ref_id asc)
# best-match pick.  Completeness of the LSH probe vs brute force is
# audited separately in tests/test_cross_corpus.py — the oracle
# verifies the probe's exact semantics, bucket-for-bucket.

_CC_N, _CC_BANDS, _CC_K, _CC_THRESH = 8, 4, 5, 0.5


def q_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup as dedup_ops

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    ref = docs.filter(F.col("doc_id") % 10 != 0)
    out = dedup_ops.cross_corpus_near_dups(
        new,
        ref,
        shingle_k=_CC_K,
        n_hashes=_CC_N,
        bands=_CC_BANDS,
        threshold=_CC_THRESH,
    )
    return out.select(
        "new_id", "ref_id", "jaccard", F.col("n_ref_matches").cast(_L).alias("n_ref_matches")
    )


def _sql_cross_corpus() -> str:
    mins = ",\n         ".join(
        f"list_min(list_transform(h32, h -> ({MINHASH_A[i]} * (h % {MINHASH_P}) "
        f"+ {MINHASH_B[i]}) % {MINHASH_P})) AS mh_{i}"
        for i in range(_CC_N)
    )
    rows_per_band = _CC_N // _CC_BANDS
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM sig".format(
            b=b,
            expr=" || '|' || ".join(
                f"mh_{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for b in range(_CC_BANDS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
  WHERE len(string_split_regex(trim(text), '\\s+')) >= {_CC_K}
),
shingled AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - {_CC_K - 1}),
                        i -> array_to_string(t[i:i+{_CC_K - 1}], ' ')) AS sh
  FROM tok
),
hashed AS (
  SELECT doc_id,
         list_distinct(list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS h32
  FROM shingled
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed
),
banded AS (
{bands}
),
cand AS (
  SELECT DISTINCT n.doc_id AS nid, r.doc_id AS rid
  FROM banded n JOIN banded r ON n.band = r.band AND n.bucket = r.bucket
  WHERE n.doc_id % 10 = 0 AND r.doc_id % 10 <> 0
),
scored AS (
  SELECT c.nid, c.rid,
         ROUND(CAST(len(list_intersect(sa.h32, sb.h32)) AS DOUBLE)
               / (len(sa.h32) + len(sb.h32) - len(list_intersect(sa.h32, sb.h32))), 6)
           AS jaccard
  FROM cand c
  JOIN hashed sa ON c.nid = sa.doc_id
  JOIN hashed sb ON c.rid = sb.doc_id
),
filt AS (SELECT * FROM scored WHERE jaccard >= {_CC_THRESH}),
best AS (
  SELECT nid, rid, jaccard,
         ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jaccard DESC, rid) AS rk,
         COUNT(*) OVER (PARTITION BY nid) AS nm
  FROM filt
)
SELECT nid AS new_id, rid AS ref_id, jaccard,
       CAST(nm AS BIGINT) AS n_ref_matches
FROM best WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# assembly — SQL builders run lazily at import of this module (after
# the leg modules are initialized), so each union row always embeds
# the CURRENT text of its legs' oracles.

SPARK_QUERIES = {
    "set_ops_audit": q_set_ops_audit,
    "format_audit": q_format_audit,
    "window_audit": q_window_audit,
    "split_mix_audit": q_split_mix_audit,
    "rank_audit": q_rank_audit,
    "ann_audit": q_ann_audit,
    "reshape_audit": q_reshape_audit,
    "aug_audit": q_aug_audit,
    "url_dedup": q_url_dedup,
    "classifier_score": q_classifier_score,
    "cross_corpus": q_cross_corpus,
}


def build_oracle_sql() -> dict[str, str]:
    return {
        "set_ops_audit": _sql_set_ops_audit(),
        "format_audit": _sql_format_audit(),
        "window_audit": _sql_window_audit(),
        "split_mix_audit": _sql_split_mix_audit(),
        "rank_audit": _sql_rank_audit(),
        "ann_audit": _sql_ann_audit(),
        "reshape_audit": _sql_reshape_audit(),
        "aug_audit": _sql_aug_audit(),
        "url_dedup": SQL_URL_DEDUP,
        "classifier_score": _sql_classifier_score(),
        "cross_corpus": _sql_cross_corpus(),
    }


# The registered pairs each union row replaces (the operators stay
# implemented and hash-verified inside the union; only the duplicate
# registry rows go).  dim_enrichment is row-dropped without a union:
# topk_other exercises the identical join_ops.enrich broadcast chain
# under the oracle every rotation (the r7 bm25_search precedent).
AUDIT_REPLACES = {
    "set_ops_audit": ("semi_anti", "except_keys"),
    "format_audit": ("string_ops", "iso_format"),
    "window_audit": ("running_total", "pct_of_group"),
    "split_mix_audit": ("data_split", "sample_mix"),
    "rank_audit": ("rank_lookup", "rank_inference"),
    "ann_audit": ("ann_cosine", "ann_pq"),
    "reshape_audit": ("unpivot_metrics", "pivot_status"),
}
