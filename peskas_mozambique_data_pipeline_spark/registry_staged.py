"""Round-9 registration staging: rows pre-built and parity-tested one
round ahead — three CONSOLIDATION union rows (each replaces two
registered rows, freeing slots) plus one NEW-query candidate
(``train_shards``) to spend a freed slot on.

The registry sits at the 100-query ceiling and the rotation window is
exactly full this round, so these rows CANNOT be registered yet —
swapping them in now would demote a driver-stale row out of the
verification window (see NOTES "r9 START HERE").  They are therefore
staged here, outside ``SPARK_QUERIES`` / ``ORACLE_SQL``, with
two kinds of evidence already attached:

* parity pytest — each union row reproduces the exact values of the
  two currently-registered rows it replaces
  (``tests/test_registry_staged.py``);
* oracle pytest — each staged DuckDB twin matches the staged Spark
  plan bit-for-bit at sf0.001, using the same normalize/compare as
  ``tools/check_correctness.py``.

r9 registration is then a mechanical diff: move the pair's names out
of the registry dicts, add the staged name, resize ``_VERIFY_LAST``.

Consolidation shapes (the ``dup_span_audit`` / ``sketch_audit`` /
``ts_audit`` precedent — one shared materialization feeding both
operators, both still hash-verified):

* ``doc_profile`` = ``text_quality`` + ``lang_id``: both are
  single-pass per-document column expressions over the same token
  split, so they CHAIN — one documents scan, zero joins, zero
  shuffles, versus two full scans today.
* ``doc_signature`` = ``doc_fingerprint`` + ``doc_winnow``: same
  chaining argument (k-min-sketch and winnowing fingerprints are both
  per-row array expressions over the token array).
* ``funnel_cohorts`` = ``conversion_funnel`` + ``retention_cohorts``:
  both consume the same 3-column projection of ``events``; the
  projection is localCheckpointed once and feeds both branches, whose
  outputs normalize onto a (stat, stage, k1, k2, n, ratio) union
  schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import text as text_ops
from .operators.windows import funnel_stages, retention_matrix
from .registry_text import (
    SQL_DOC_FINGERPRINT,
    SQL_DOC_WINNOW,
    SQL_LANG_ID,
    SQL_TEXT_QUALITY,
)
from .session import read_table


# ---------------------------------------------------------------------------
# doc_profile = text_quality + lang_id, one scan.


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = text_ops.language_id(text_ops.quality_features(docs))
    return out.select(
        "doc_id",
        "n_tokens",
        "mean_token_len",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
        "lang",
        "pred_lang",
        "score_de",
        "score_en",
        "score_es",
        "score_fr",
    )


# The oracle replays the two registered oracles verbatim and joins on
# the document key (1:1 by construction), so staged-vs-registered
# drift is impossible: any future edit to the registered SQL flows
# into this union row automatically.
SQL_DOC_PROFILE = f"""
WITH quality AS ({SQL_TEXT_QUALITY}),
langid AS ({SQL_LANG_ID})
SELECT q.doc_id, q.n_tokens, q.mean_token_len, q.punct_ratio,
       q.stopword_ratio, q.quality_score,
       l.lang, l.pred_lang, l.score_de, l.score_en, l.score_es, l.score_fr
FROM quality q JOIN langid l ON q.doc_id = l.doc_id
"""


# ---------------------------------------------------------------------------
# doc_signature = doc_fingerprint + doc_winnow, one scan.


def q_doc_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = text_ops.winnow_fingerprint(
        text_ops.fingerprint(docs, k=4), gram_k=3, window=8
    )
    return out.select("doc_id", "fingerprint", "winnow_fp")


SQL_DOC_SIGNATURE = f"""
WITH kmin AS ({SQL_DOC_FINGERPRINT}),
winnow AS ({SQL_DOC_WINNOW})
SELECT k.doc_id, k.fingerprint, w.winnow_fp
FROM kmin k JOIN winnow w ON k.doc_id = w.doc_id
"""


# ---------------------------------------------------------------------------
# funnel_cohorts = conversion_funnel + retention_cohorts, one events
# projection materialized once.

_FUNNEL_STAGES = ("signup", "click", "purchase")


def q_funnel_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .localCheckpoint()
    )
    funnel = funnel_stages(ev, list(_FUNNEL_STAGES)).select(
        F.lit("funnel").alias("stat"),
        F.col("stage"),
        F.col("stage_idx").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("n_users").cast("long").alias("n"),
        F.col("pct_of_first").alias("ratio"),
    )
    cohorts = retention_matrix(ev, period_days=7).select(
        F.lit("cohort").alias("stat"),
        F.lit(None).cast("string").alias("stage"),
        F.col("cohort_period").cast("long").alias("k1"),
        F.col("periods_since").cast("long").alias("k2"),
        F.col("n_active").cast("long").alias("n"),
        F.lit(None).cast("double").alias("ratio"),
    )
    return funnel.unionByName(cohorts)


SQL_FUNNEL_COHORTS = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
),
g1 AS (
  SELECT t0 AS g0,
         CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END AS g1, t2
  FROM u
),
g2 AS (
  SELECT g0, g1,
         CASE WHEN g1 IS NOT NULL AND t2 > g1 THEN t2 END AS g2
  FROM g1
),
c AS (
  SELECT COUNT(g0) AS n0, COUNT(g1) AS n1, COUNT(g2) AS n2 FROM g2
),
funnel AS (
  SELECT 'funnel' AS stat, 'signup' AS stage, CAST(0 AS BIGINT) AS k1,
         CAST(NULL AS BIGINT) AS k2, CAST(n0 AS BIGINT) AS n,
         ROUND(n0 / CAST(n0 AS DOUBLE), 6) AS ratio FROM c
  UNION ALL
  SELECT 'funnel', 'click', 1, NULL, CAST(n1 AS BIGINT),
         ROUND(n1 / CAST(n0 AS DOUBLE), 6) FROM c
  UNION ALL
  SELECT 'funnel', 'purchase', 2, NULL, CAST(n2 AS BIGINT),
         ROUND(n2 / CAST(n0 AS DOUBLE), 6) FROM c
),
d AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS dd FROM events
),
first AS (
  SELECT user_id, MIN(dd) AS d0 FROM d GROUP BY user_id
),
cell AS (
  SELECT DISTINCT d.user_id,
         CAST(floor(f.d0 / 7) AS BIGINT) AS cohort_period,
         CAST(floor((d.dd - f.d0) / 7) AS BIGINT) AS periods_since
  FROM d JOIN first f ON d.user_id = f.user_id
)
SELECT stat, stage, k1, k2, n, ratio FROM funnel
UNION ALL
SELECT 'cohort', CAST(NULL AS VARCHAR), cohort_period, periods_since,
       CAST(COUNT(*) AS BIGINT), CAST(NULL AS DOUBLE)
FROM cell GROUP BY cohort_period, periods_since
"""


# ---------------------------------------------------------------------------
# train_shards — NEW-query candidate for a slot the consolidations
# above free at r9 (not a consolidation itself, hence no REPLACES
# entry).  Token-budget shard assignment over the deterministic
# training order: the Spark side composes deterministic_shuffle (dense
# rank, no global window) with token_shard_ids (distributed prefix sum
# of token counts, no global window); the oracle IS the single-node
# global running-sum window — a hash match proves the two-phase prefix
# sum equals the global cumulative sum bit-for-bit, the corpus_shuffle
# proof extended from ranks to weighted prefix sums.

_SHARD_SALT = "r9shards"
_SHARD_TOKENS = 5_000


def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import curation as cur_ops
    from .operators.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    # fused shuffle + prefix sum (r14): one range exchange, one
    # checkpoint and one bounded collect produce both shuffle_pos and
    # tok_before — bit-identical to the former deterministic_shuffle →
    # token_shard_ids two-stage pipeline (parity pytest in
    # tests/test_curation.py); the shard id is the same exact BIGINT
    # division token_shard_ids applied
    cum = cur_ops.shuffled_token_cum(
        docs, "doc_id", salt=_SHARD_SALT, tokens_col="n_tok"
    )
    return cum.select(
        "doc_id",
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
        "n_tok",
        F.expr(f"tok_before div {int(_SHARD_TOKENS)}").cast("long").alias("shard_id"),
    )


SQL_TRAIN_SHARDS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         md5('{_SHARD_SALT}_' || CAST(doc_id AS VARCHAR)) AS sk
  FROM documents
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY sk, doc_id) - 1 AS BIGINT) AS shuffle_pos,
       n_tok,
       CAST(COALESCE(SUM(n_tok) OVER (
           ORDER BY sk, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
FROM t
"""


# ---------------------------------------------------------------------------
# fim_audit — second NEW-query candidate (operators/augment.py): the
# fill-in-the-middle rewrite is fully oracle-replayable because every
# random choice is md5 modular arithmetic and every string operation is
# a token-array slice.  A hash match proves selection, both cut points,
# and the byte-exact sentinel layout cross-engine.

_FIM_SALT = "fim0"
_FIM_RATE = 0.5


def q_fim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import augment as aug_ops

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = aug_ops.fim_transform(
        docs, rate=_FIM_RATE, salt=_FIM_SALT, out_col="aug_text"
    )
    return out.select("doc_id", "fim_applied", "aug_text")


SQL_FIM_AUDIT = f"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents
),
u AS (
  SELECT doc_id, text, toks, n,
         ('0x' || substr(md5('{_FIM_SALT}_pick_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 1000000000 AS pick,
         ('0x' || substr(md5('{_FIM_SALT}_a_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ua,
         ('0x' || substr(md5('{_FIM_SALT}_b_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ub
  FROM t
),
v AS (
  SELECT doc_id, text, toks, n, ub,
         (pick < {int(round(_FIM_RATE * 1_000_000_000))} AND n >= 8) AS sel,
         ua % (n - 1) + 1 AS a
  FROM u
),
w AS (
  SELECT doc_id, text, toks, n, sel, a, a + (ub % (n - a)) + 1 AS b FROM v
)
SELECT doc_id, sel AS fim_applied,
       CASE WHEN sel THEN
         '<|fim_prefix|>' || array_to_string(list_slice(toks, 1, a), ' ')
         || ' <|fim_suffix|> '
         -- b can equal n (empty suffix): duckdb's out-of-range slice is
         -- NULL, spark's is an empty array — coalesce to ''
         || COALESCE(array_to_string(list_slice(toks, b + 1, n), ' '), '')
         || ' <|fim_middle|> ' || array_to_string(list_slice(toks, a + 1, b), ' ')
       ELSE text END AS aug_text
FROM w
"""


# ---------------------------------------------------------------------------
# span_audit — third NEW-query candidate: T5-style span corruption
# (operators/augment.py::span_corrupt).  Same replayability argument as
# fim_audit: md5 modular span placement + list slicing; the oracle
# reproduces inputs AND targets byte-exactly, covering the second
# augmentation transform's selection, both span starts, and the
# sentinel assembly.

_SPAN_SALT = "t5_0"
_SPAN_N = 2
_SPAN_LEN = 3


def q_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import augment as aug_ops

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = aug_ops.span_corrupt(
        docs, n_spans=_SPAN_N, span_len=_SPAN_LEN, salt=_SPAN_SALT
    )
    return out.select("doc_id", "corrupt_applied", "inputs", "targets")


def _sql_span_audit() -> str:
    # starts: s_i = i*seg + (u_i % (seg - span_len)); same closed-form
    # disjoint-segment placement as the Spark expression chain
    u = (
        "('0x' || substr(md5('{salt}_s{i}_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    )
    starts = [
        f"(({i} * seg) + ({u.format(salt=_SPAN_SALT, i=i)} % (seg - {_SPAN_LEN}))) AS s{i}"
        for i in range(_SPAN_N)
    ]
    sent = ["<|extra_id_0|>", "<|extra_id_1|>"]
    inputs = (
        f"COALESCE(array_to_string(list_slice(toks, 1, s0), ' '), '')"
        f" || ' {sent[0]} ' ||"
        f" COALESCE(array_to_string(list_slice(toks, s0 + {_SPAN_LEN} + 1, s1), ' '), '')"
        f" || ' {sent[1]} ' ||"
        f" COALESCE(array_to_string(list_slice(toks, s1 + {_SPAN_LEN} + 1, n), ' '), '')"
    )
    targets = (
        f"'{sent[0]} ' || array_to_string(list_slice(toks, s0 + 1, s0 + {_SPAN_LEN}), ' ')"
        f" || ' {sent[1]} ' || array_to_string(list_slice(toks, s1 + 1, s1 + {_SPAN_LEN}), ' ')"
    )
    min_ok = max(16, _SPAN_N * (_SPAN_LEN + 1))
    return f"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents
),
g AS (
  SELECT doc_id, text, toks, n,
         CAST(floor(n / {_SPAN_N}) AS INT) AS seg
  FROM t
),
p AS (
  SELECT doc_id, text, toks, n, seg,
         (n >= {min_ok} AND seg > {_SPAN_LEN}) AS ok,
         {', '.join(starts)}
  FROM g
)
SELECT doc_id, ok AS corrupt_applied,
       CASE WHEN ok THEN {inputs} ELSE text END AS inputs,
       CASE WHEN ok THEN {targets} END AS targets
FROM p
"""


SQL_SPAN_AUDIT = _sql_span_audit()


STAGED_QUERIES = {
    "doc_profile": q_doc_profile,
    "doc_signature": q_doc_signature,
    "funnel_cohorts": q_funnel_cohorts,
    "train_shards": q_train_shards,
    "fim_audit": q_fim_audit,
    "span_audit": q_span_audit,
}

STAGED_ORACLE_SQL = {
    "doc_profile": SQL_DOC_PROFILE,
    "doc_signature": SQL_DOC_SIGNATURE,
    "funnel_cohorts": SQL_FUNNEL_COHORTS,
    "train_shards": SQL_TRAIN_SHARDS,
    "fim_audit": SQL_FIM_AUDIT,
    "span_audit": SQL_SPAN_AUDIT,
}

# The pairs each staged row replaces at r9 registration time
# (new-query candidates like train_shards fill slots the replacements
# free, so they carry no entry here).
STAGED_REPLACES = {
    "doc_profile": ("text_quality", "lang_id"),
    "doc_signature": ("doc_fingerprint", "doc_winnow"),
    "funnel_cohorts": ("conversion_funnel", "retention_cohorts"),
}
