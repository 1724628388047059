"""Round-10 in-round registry rows (VERDICT r9 Next #3).

Two kinds of row, following the ``registry_audit`` r9 precedent:

**Rotation-window union rows** — same-family pairs of long-green
registered queries merged into ONE audit row each.  Both operators stay
fully hash-verified: each union leg is the ORIGINAL registered query
function called verbatim, its output normalized onto a shared schema
with a ``stat`` discriminator, and the oracle wraps the ORIGINAL oracle
SQL in a CTE the same way — any future edit to a leg flows into the
union automatically.  Why now: the r10 head is full (50 slots), so the
three NEW operator rows below need three slots freed WITHIN the
rotating-in set; merging same-family pairs is the move that keeps every
query ≤1 round driver-stale (NOTES "r10 window arithmetic").

* ``lexical_audit`` = ``unigram_logloss`` + ``vocab_coverage`` (both
  corpus-level token-statistics queries over the same tokenization).
* ``filter_audit`` = ``c4_filter`` + ``boilerplate`` (both document
  quality-gate batteries over the documents table).
* ``activity_audit`` = ``events_hourly`` + ``user_activity`` (both
  event-time rollups over the events table).

**New operator rows** — first hard driver rows for the three r9
computational operators that only had pytest coverage (VERDICT r9
"What's missing" #1):

* ``threshold_audit`` — :func:`operators.classifier.calibrate_threshold`
  over a deterministic scored+labeled frame derived from ``documents``
  (score = exact small integers cast to double, label = an arithmetic
  rule with mod-7 noise so the confusion counts are nontrivial).  The
  operator is exact integers end to end (BIGINT ``div`` nano metrics),
  so the oracle replays the cumulative confusion table verbatim.
* ``lang_segment`` — :func:`operators.text.segment_languages` with
  ``scrub=True`` over synthesized multi-line text (the documents table
  is single-line; appending one French-marker or English-marker line
  plus one German-marker or blank line per doc exercises voting,
  tie-breaks, the und-neutral rule and the ordered scrub rebuild).
  The oracle replays the per-line marker argmax and majority vote.
* ``drift_audit`` — :func:`operators.similarity.embedding_drift`
  between the even and odd ``vec_id`` halves of the embeddings table
  against a fixed shared centroid set (``vec_id < 8`` — deterministic,
  no k-means in the oracle).  Exact counts + nano shares.

Reference parity: the union legs carry their original citations; the
new rows cite the same reference surfaces as their operators
(R/validation.R flag tables for threshold selection; the CCNet-style
per-line pass has no reference twin — LLM-pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import read_table

_S = "string"
_L = "long"
_D = "double"
_T = "timestamp"


def _null(t: str):
    return F.lit(None).cast(t)


# ---------------------------------------------------------------------------
# lexical_audit = unigram_logloss + vocab_coverage: corpus token
# statistics over the shared whitespace tokenization.


def q_lexical_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import q_unigram_logloss, q_vocab_coverage

    a = q_unigram_logloss(spark, sf_dir).select(
        F.lit("logloss").alias("stat"),
        F.col("doc_id").cast(_L).alias("k"),
        F.col("n_tokens").cast(_L).alias("n1"),
        _null(_L).alias("n2"),
        F.col("cross_entropy").cast(_D).alias("v"),
    )
    b = q_vocab_coverage(spark, sf_dir).select(
        F.lit("vocab").alias("stat"),
        F.col("k").cast(_L).alias("k"),
        F.col("covered_tokens").cast(_L).alias("n1"),
        F.col("total_tokens").cast(_L).alias("n2"),
        F.col("coverage").cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_lexical_audit() -> str:
    from .registry_text import SQL_UNIGRAM_LOGLOSS, SQL_VOCAB_COVERAGE

    return f"""
WITH a AS ({SQL_UNIGRAM_LOGLOSS}),
b AS ({SQL_VOCAB_COVERAGE})
SELECT 'logloss' AS stat, CAST(doc_id AS BIGINT) AS k,
       CAST(n_tokens AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
       CAST(cross_entropy AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'vocab', CAST(k AS BIGINT), CAST(covered_tokens AS BIGINT),
       CAST(total_tokens AS BIGINT), CAST(coverage AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# filter_audit = c4_filter + boilerplate: document quality gates.


def q_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import q_boilerplate, q_c4_filter

    a = q_c4_filter(spark, sf_dir).select(
        F.lit("c4").alias("stat"),
        F.col("doc_id").cast(_S).alias("key"),
        F.col("flag_too_short").alias("b1"),
        F.col("flag_too_long").alias("b2"),
        F.col("flag_bad_mean_token_len").alias("b3"),
        F.col("flag_low_stopword").alias("b4"),
        F.col("flag_high_punct").alias("b5"),
        F.col("keep").alias("keep"),
        _null(_L).alias("n"),
        _null(_S).alias("s"),
    )
    b = q_boilerplate(spark, sf_dir).select(
        F.lit("boiler").alias("stat"),
        F.col("phrase_digest").alias("key"),
        _null("boolean").alias("b1"),
        _null("boolean").alias("b2"),
        _null("boolean").alias("b3"),
        _null("boolean").alias("b4"),
        _null("boolean").alias("b5"),
        _null("boolean").alias("keep"),
        F.col("n_docs").cast(_L).alias("n"),
        F.col("exemplar").alias("s"),
    )
    return a.unionByName(b)


def _sql_filter_audit() -> str:
    from .registry_text import SQL_BOILERPLATE, SQL_C4_FILTER

    return f"""
WITH a AS ({SQL_C4_FILTER}),
b AS ({SQL_BOILERPLATE})
SELECT 'c4' AS stat, CAST(doc_id AS VARCHAR) AS key,
       flag_too_short AS b1, flag_too_long AS b2,
       flag_bad_mean_token_len AS b3, flag_low_stopword AS b4,
       flag_high_punct AS b5, keep,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS s
FROM a
UNION ALL
SELECT 'boiler', key, NULL, NULL, NULL, NULL, NULL, NULL, n, s
FROM (SELECT phrase_digest AS key, CAST(n_docs AS BIGINT) AS n, exemplar AS s FROM b)
"""


# ---------------------------------------------------------------------------
# activity_audit = events_hourly + user_activity: event-time rollups.


def q_activity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_relational import q_events_hourly, q_user_activity

    a = q_events_hourly(spark, sf_dir).select(
        F.lit("hourly").alias("stat"),
        F.col("hour").cast(_T).alias("t"),
        F.col("event_type").cast(_S).alias("key"),
        F.col("n_events").cast(_L).alias("n1"),
        F.col("n_users").cast(_L).alias("n2"),
        F.col("total_value").cast(_D).alias("v1"),
        _null(_D).alias("v2"),
    )
    b = q_user_activity(spark, sf_dir).select(
        F.lit("user").alias("stat"),
        _null(_T).alias("t"),
        F.col("user_id").cast(_S).alias("key"),
        F.col("n_events").cast(_L).alias("n1"),
        _null(_L).alias("n2"),
        F.col("span_hours").cast(_D).alias("v1"),
        F.col("events_per_hour").cast(_D).alias("v2"),
    )
    return a.unionByName(b)


def _sql_activity_audit() -> str:
    from .registry_relational import SQL_EVENTS_HOURLY, SQL_USER_ACTIVITY

    return f"""
WITH a AS ({SQL_EVENTS_HOURLY}),
b AS ({SQL_USER_ACTIVITY})
SELECT 'hourly' AS stat, CAST(hour AS TIMESTAMP) AS t,
       CAST(event_type AS VARCHAR) AS key,
       CAST(n_events AS BIGINT) AS n1, CAST(n_users AS BIGINT) AS n2,
       CAST(total_value AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
FROM a
UNION ALL
SELECT 'user', CAST(NULL AS TIMESTAMP), CAST(user_id AS VARCHAR),
       CAST(n_events AS BIGINT), CAST(NULL AS BIGINT),
       CAST(span_hours AS DOUBLE), CAST(events_per_hour AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# threshold_audit — calibrate_threshold under the hard oracle.  Score =
# (doc_id*37) % 101 (exact small integers as double: one representable
# value per residue), label = score-plus-mod-7-noise rule so every
# confusion cell is populated.  The operator's window runs over ≤101
# DISTINCT scores — the bounded-validation-set shape it documents.


def q_threshold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classifier import calibrate_threshold

    scored = read_table(spark, sf_dir, "documents").select(
        ((F.col("doc_id") * 37) % 101).cast(_D).alias("score"),
        F.when(
            ((F.col("doc_id") * 37) % 101) + (F.col("doc_id") % 7) > 55, 1
        )
        .otherwise(0)
        .alias("label"),
    )
    return calibrate_threshold(scored)


SQL_THRESHOLD_AUDIT = """
WITH scored AS (
  SELECT CAST((doc_id * 37) % 101 AS DOUBLE) AS score,
         CASE WHEN ((doc_id * 37) % 101) + (doc_id % 7) > 55
              THEN 1 ELSE 0 END AS label
  FROM documents
),
per AS (
  SELECT score,
         CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN label = 1 THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM scored GROUP BY score
),
cum AS (
  SELECT score,
         CAST(SUM(pos) OVER w AS BIGINT) AS tp,
         CAST(SUM(neg) OVER w AS BIGINT) AS fp,
         CAST(SUM(pos) OVER () - SUM(pos) OVER w AS BIGINT) AS fn
  FROM per
  WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT score AS threshold, tp, fp, fn,
       CAST(CASE WHEN tp + fp > 0 THEN (tp * 1000000000) // (tp + fp)
                 ELSE 1000000000 END AS BIGINT) AS precision_nano,
       CAST(CASE WHEN tp + fn > 0 THEN (tp * 1000000000) // (tp + fn)
                 ELSE 1000000000 END AS BIGINT) AS recall_nano,
       CAST(CASE WHEN 2 * tp + fp + fn > 0
                 THEN (2 * tp * 1000000000) // (2 * tp + fp + fn)
                 ELSE 0 END AS BIGINT) AS f1_nano
FROM cum
"""


# ---------------------------------------------------------------------------
# lang_segment — per-line language segmentation with scrub.  The
# documents text is single-line, so each doc gets one French-marker OR
# English-marker line (mod 3) plus one German-marker OR blank line
# (mod 4): voting, the lexicographic tie-breaks (smallest lang wins the
# per-line argmax, greatest wins the per-doc majority), und-neutral
# blank lines and the ordered scrub rebuild are all exercised.


def _lang_segment_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    line2 = F.when(
        F.col("doc_id") % 3 == 0, F.lit("le et les des un")
    ).otherwise(F.lit("the of and to is"))
    line3 = F.when(
        F.col("doc_id") % 4 == 0, F.lit("der die das und ist")
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"), line2, line3).alias("text"),
    )


def q_lang_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import segment_languages

    out = segment_languages(
        _lang_segment_input(spark, sf_dir), scrub=True
    )
    return out.select(
        "doc_id", "doc_lang", "lang_line_share", "scrubbed_text"
    )


def _marker_line_sql(lang: str, line: str) -> str:
    from .operators.text import LANG_MARKERS

    lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(trim({line}), '\\s+'),"
        f" x -> x IN ({lst})))"
    )


def _sql_lang_segment() -> str:
    g = "GREATEST(s_de, s_en, s_es, s_fr)"
    return f"""
WITH base AS (
  SELECT doc_id,
         text || chr(10)
         || CASE WHEN doc_id % 3 = 0 THEN 'le et les des un'
                 ELSE 'the of and to is' END
         || chr(10)
         || CASE WHEN doc_id % 4 = 0 THEN 'der die das und ist'
                 ELSE '' END AS text
  FROM documents
),
lines AS (
  -- multiple unnests in a SELECT list zip element-wise in DuckDB
  SELECT doc_id,
         unnest(generate_series(1, len(parts))) AS pos,
         unnest(parts) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM base)
),
scored AS (
  SELECT doc_id, pos, line,
         {_marker_line_sql('de', 'line')} AS s_de,
         {_marker_line_sql('en', 'line')} AS s_en,
         {_marker_line_sql('es', 'line')} AS s_es,
         {_marker_line_sql('fr', 'line')} AS s_fr
  FROM lines
),
pred AS (
  SELECT doc_id, pos, line,
         CASE WHEN {g} = 0 THEN 'und'
              WHEN s_de = {g} THEN 'de'
              WHEN s_en = {g} THEN 'en'
              WHEN s_es = {g} THEN 'es'
              ELSE 'fr' END AS lang
  FROM scored
),
votes AS (
  SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred WHERE lang <> 'und' GROUP BY doc_id, lang
),
winner AS (
  SELECT doc_id, lang AS doc_lang,
         ROUND(CAST(n AS DOUBLE) / voted, 6) AS share
  FROM (
    SELECT doc_id, lang, n,
           SUM(n) OVER (PARTITION BY doc_id) AS voted,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY n DESC, lang DESC) AS rk
    FROM votes
  ) WHERE rk = 1
),
scrub AS (
  SELECT p.doc_id,
         array_to_string(list(p.line ORDER BY p.pos), chr(10)) AS scrubbed_text
  FROM pred p JOIN winner w ON p.doc_id = w.doc_id
  WHERE p.lang = w.doc_lang OR p.lang = 'und'
  GROUP BY p.doc_id
)
SELECT b.doc_id,
       COALESCE(w.doc_lang, 'und') AS doc_lang,
       COALESCE(w.share, 1.0) AS lang_line_share,
       COALESCE(s.scrubbed_text, b.text) AS scrubbed_text
FROM base b
LEFT JOIN winner w ON b.doc_id = w.doc_id
LEFT JOIN scrub s ON b.doc_id = s.doc_id
"""


# ---------------------------------------------------------------------------
# drift_audit — embedding-distribution drift between the even and odd
# vec_id halves against a FIXED shared centroid set (vec_id < 8), so
# the oracle replays a single nearest-centroid pass (no k-means): exact
# occupancy counts and BIGINT-div nano shares.


def q_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import embedding_drift

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_drift(old, new, cents)


def _sql_drift_audit() -> str:
    from .registry_text import _sql_dot, _sql_norm

    cos = (
        f"({_sql_dot('e.embedding', 'c.centroid')}"
        f" / ({_sql_norm('e.embedding')} * {_sql_norm('c.centroid')}))"
    )
    return f"""
WITH cents AS (
  SELECT CAST(vec_id AS INTEGER) AS centroid_id, embedding AS centroid
  FROM embeddings WHERE vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id, side FROM (
    SELECT e.vec_id, c.centroid_id, e.vec_id % 2 AS side,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.centroid_id) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
occ AS (
  SELECT centroid_id,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM assign GROUP BY centroid_id
),
filled AS (
  SELECT c.centroid_id,
         COALESCE(o.n_old, 0) AS n_old, COALESCE(o.n_new, 0) AS n_new
  FROM cents c LEFT JOIN occ o ON c.centroid_id = o.centroid_id
),
tot AS (
  SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
         CAST(SUM(n_new) AS BIGINT) AS t_new
  FROM filled
)
SELECT centroid_id, n_old, n_new,
       CAST(CASE WHEN t_old > 0 THEN (n_old * 1000000000) // t_old
                 ELSE 0 END AS BIGINT) AS share_old_nano,
       CAST(CASE WHEN t_new > 0 THEN (n_new * 1000000000) // t_new
                 ELSE 0 END AS BIGINT) AS share_new_nano,
       CAST(CASE WHEN t_new > 0 THEN (n_new * 1000000000) // t_new
                 ELSE 0 END
            - CASE WHEN t_old > 0 THEN (n_old * 1000000000) // t_old
                   ELSE 0 END AS BIGINT) AS delta_nano
FROM filled, tot
"""


# ---------------------------------------------------------------------------

SPARK_QUERIES = {
    "lexical_audit": q_lexical_audit,
    "filter_audit": q_filter_audit,
    "activity_audit": q_activity_audit,
    "threshold_audit": q_threshold_audit,
    "lang_segment": q_lang_segment,
    "drift_audit": q_drift_audit,
}


def build_oracle_sql() -> dict[str, str]:
    return {
        "lexical_audit": _sql_lexical_audit(),
        "filter_audit": _sql_filter_audit(),
        "activity_audit": _sql_activity_audit(),
        "threshold_audit": SQL_THRESHOLD_AUDIT,
        "lang_segment": _sql_lang_segment(),
        "drift_audit": _sql_drift_audit(),
    }


# names each union row replaces at registration time
AUDIT_REPLACES = {
    "lexical_audit": ("unigram_logloss", "vocab_coverage"),
    "filter_audit": ("c4_filter", "boilerplate"),
    "activity_audit": ("events_hourly", "user_activity"),
}
