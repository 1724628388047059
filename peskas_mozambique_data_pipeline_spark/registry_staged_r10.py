"""Round-10 staged registry rows (the registry_staged / registry_audit
pattern: every row lands with bit-exact DuckDB oracle evidence one
round BEFORE registration, so the r10 swap starts green).

Staged here:

* ``quant_audit`` — consolidation: ``ann_int8`` + ``pooled_ann`` (both
  pure-BIGINT cosine folds over the embeddings table, the r9 NOTES
  r10-candidate) union into one row.  Legs call the REGISTERED query
  functions verbatim and the oracle wraps the registered SQL strings
  in CTEs, so any edit to a leg flows into the union — zero drift.
* ``seq_layout`` — NEW row: the GPT-style concat-and-split pretraining
  placement (``curation.concat_split_layout``).  The distributed
  prefix sum + integer sequence arithmetic replay as a single-node
  running-sum window — the ``train_shards`` precedent, extended to
  (seq_id, seq_offset, end_seq, n_seqs).
* ``contam_score`` — NEW row: graded benchmark contamination
  (``text.contamination_score``).  Totals and hits are exact integer
  counts; the fraction ships as EXACT nano units via BIGINT ``div``
  (never a rounded float — keeps the row out of the boundary-audit
  class by construction).
* ``psl_domains`` — NEW row: the full public-suffix matcher
  (``web.registrable_domain_psl``) over deterministically synthesized
  hosts covering every rule class (normal, 2-level ccTLD, wildcard,
  exception, bare-suffix → NULL, unknown TLD → implicit ``*``).  The
  oracle derives the registrable domain ANALYTICALLY from the host
  generator — ground truth independent of the matcher, the
  ``url_dedup`` precedent.
* ``card_audit`` — NEW row: Luhn-validated card redaction
  (``text.luhn_valid``/``redact_cards``).  One 16-digit run per doc
  (4100…+doc_id — consecutive integers are Luhn-valid exactly
  one-in-ten, so validity coverage is structural); the oracle replays
  the mod-10 checksum and the literal replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import read_table

_L = "long"


# ---------------------------------------------------------------------------
# quant_audit = ann_int8 + pooled_ann


def q_quant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_ann_int8, q_pooled_ann

    a = q_ann_int8(spark, sf_dir).select(
        F.lit("int8").alias("stat"),
        "query_id",
        "neighbor_id",
        F.col("rank").cast(_L).alias("rank"),
        F.col("cosine_q8").alias("score"),
    )
    b = q_pooled_ann(spark, sf_dir).select(
        F.lit("pooled").alias("stat"),
        "query_id",
        "neighbor_id",
        F.col("rank").cast(_L).alias("rank"),
        F.col("cosine_sim").alias("score"),
    )
    return a.unionByName(b)


def _sql_quant_audit() -> str:
    from .registry_curation import SQL_ANN_INT8, SQL_POOLED_ANN

    return f"""
WITH a AS ({SQL_ANN_INT8}),
b AS ({SQL_POOLED_ANN})
SELECT 'int8' AS stat, query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       cosine_q8 AS score FROM a
UNION ALL
SELECT 'pooled', query_id, neighbor_id, CAST(rank AS BIGINT),
       cosine_sim FROM b
"""


# ---------------------------------------------------------------------------
# seq_layout — concat-and-split placement over the deterministic
# corpus order.  seq_len is prime so sequence boundaries land inside
# documents of every size (the interesting split cases).

_SEQ_SALT = "seq0"
_SEQ_LEN = 257


def q_seq_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import curation as cur_ops
    from .operators.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    # fused shuffle + prefix sum (r14): one range exchange / checkpoint
    # / bounded collect instead of two — the placement arithmetic below
    # is exactly concat_split_layout's, on the identical tok_before
    # integers (parity pytest in tests/test_curation.py)
    cum = cur_ops.shuffled_token_cum(
        docs, "doc_id", salt=_SEQ_SALT, tokens_col="n_tok"
    )
    L = int(_SEQ_LEN)
    tok = F.col("n_tok").cast("long")
    out = (
        cum.withColumn("seq_id", F.expr(f"tok_before div {L}"))
        .withColumn("seq_offset", F.pmod(F.col("tok_before"), F.lit(L)).cast("long"))
        .withColumn(
            "end_seq",
            F.when(tok > 0, F.expr(f"(tok_before + n_tok - 1) div {L}"))
            .otherwise(F.col("seq_id"))
            .cast("long"),
        )
        .withColumn("n_seqs", (F.col("end_seq") - F.col("seq_id") + 1).cast("long"))
    )
    return out.select(
        "doc_id",
        F.col("shuffle_pos").cast(_L).alias("shuffle_pos"),
        "n_tok",
        "tok_before",
        "seq_id",
        "seq_offset",
        "end_seq",
        "n_seqs",
    )


SQL_SEQ_LAYOUT = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         md5('{_SEQ_SALT}_' || CAST(doc_id AS VARCHAR)) AS sk
  FROM documents
),
o AS (
  SELECT doc_id, n_tok,
         CAST(ROW_NUMBER() OVER (ORDER BY sk, doc_id) - 1 AS BIGINT) AS shuffle_pos,
         CAST(COALESCE(SUM(n_tok) OVER (
             ORDER BY sk, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_before
  FROM t
),
s AS (
  SELECT *,
         tok_before // {_SEQ_LEN} AS seq_id,
         tok_before % {_SEQ_LEN} AS seq_offset,
         CASE WHEN n_tok > 0 THEN (tok_before + n_tok - 1) // {_SEQ_LEN}
              ELSE tok_before // {_SEQ_LEN} END AS end_seq
  FROM o
)
SELECT doc_id, shuffle_pos, n_tok, tok_before,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(seq_offset AS BIGINT) AS seq_offset,
       CAST(end_seq AS BIGINT) AS end_seq,
       CAST(end_seq - seq_id + 1 AS BIGINT) AS n_seqs
FROM s
"""


# ---------------------------------------------------------------------------
# contam_score — graded contamination, exact-integer surface: counts
# are BIGINTs and the fraction is nano units via exact integer div, so
# the comparison never touches a rounded float.


def q_contam_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import contamination_score

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out = contamination_score(train, benchmark, n=3)
    return out.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        F.expr("CASE WHEN n_grams > 0 THEN (n_overlap * 1000000000L) div n_grams ELSE 0L END")
        .cast(_L)
        .alias("overlap_nano"),
    )


SQL_CONTAM_SCORE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
tg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 2),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
  FROM toks WHERE len(t) >= 3
),
bg AS (SELECT DISTINCT gram FROM tg WHERE doc_id % 97 = 0),
per AS (
  SELECT t.doc_id,
         COUNT(*) AS n_grams,
         COUNT(b.gram) AS n_overlap
  FROM (SELECT * FROM tg WHERE doc_id % 97 <> 0) t
  LEFT JOIN bg b USING (gram)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN COALESCE(p.n_grams, 0) > 0
                 THEN (p.n_overlap * 1000000000) // p.n_grams
                 ELSE 0 END AS BIGINT) AS overlap_nano
FROM documents d LEFT JOIN per p USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


# ---------------------------------------------------------------------------
# psl_domains — the full-PSL matcher against analytically known hosts.
# Host generator (m = doc_id % 7, g = doc_id % 5) exercises every rule
# class; the oracle never runs a suffix match — it states the answer
# from the generator's structure.

PSL_RULES = (
    "com",
    "uk",
    "co.uk",
    "br",
    "gov.br",
    "cn",
    "com.cn",
    "ck",
    "*.ck",
    "!www.ck",
)

_HOST_GEN = """
CASE doc_id % 7
  WHEN 0 THEN concat('a', doc_id % 5, '.example.com')
  WHEN 1 THEN concat('b', doc_id % 5, '.foo.gov.br')
  WHEN 2 THEN concat('c', doc_id % 5, '.shop.com.cn')
  WHEN 3 THEN concat('w', doc_id % 5, '.any', doc_id % 5, '.ck')
  WHEN 4 THEN concat('e', doc_id % 5, '.www.ck')
  WHEN 5 THEN 'co.uk'
  ELSE concat('u', doc_id % 5, '.zzz')
END
"""


def q_psl_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import web as web_ops

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "host", F.expr(_HOST_GEN)
    )
    return docs.select(
        "doc_id",
        "host",
        web_ops.registrable_domain_psl("host", PSL_RULES).alias("reg_domain"),
    )


SQL_PSL_DOMAINS = """
SELECT doc_id,
       CASE doc_id % 7
         WHEN 0 THEN concat('a', doc_id % 5, '.example.com')
         WHEN 1 THEN concat('b', doc_id % 5, '.foo.gov.br')
         WHEN 2 THEN concat('c', doc_id % 5, '.shop.com.cn')
         WHEN 3 THEN concat('w', doc_id % 5, '.any', doc_id % 5, '.ck')
         WHEN 4 THEN concat('e', doc_id % 5, '.www.ck')
         WHEN 5 THEN 'co.uk'
         ELSE concat('u', doc_id % 5, '.zzz')
       END AS host,
       CASE doc_id % 7
         WHEN 0 THEN 'example.com'                                  -- rule com
         WHEN 1 THEN 'foo.gov.br'                                   -- rule gov.br (longest)
         WHEN 2 THEN 'shop.com.cn'                                  -- rule com.cn
         WHEN 3 THEN concat('w', doc_id % 5, '.any', doc_id % 5, '.ck')  -- wildcard *.ck
         WHEN 4 THEN 'www.ck'                                       -- exception !www.ck
         WHEN 5 THEN NULL                                           -- host IS a suffix
         ELSE concat('u', doc_id % 5, '.zzz')                       -- implicit * rule
       END AS reg_domain
FROM documents
"""




# ---------------------------------------------------------------------------
# card_audit — Luhn-validated card redaction under the hard oracle.
# Host text embeds one 16-digit run per doc (4100…+doc_id); consecutive
# integers are Luhn-valid exactly one-in-ten, so validity coverage is
# structural, not hand-picked.  The oracle replays the mod-10 checksum
# digit-by-digit (reverse → alternate doubling → sum) and the literal
# replacement — all exact integer/string work.


def q_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import luhn_valid, redact_cards

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("ref "),
            (F.lit(4100000000000000) + F.col("doc_id")).cast("string"),
            F.lit(" end"),
        ).alias("text"),
    )
    out = redact_cards(docs)
    return out.select(
        "doc_id",
        F.col("n_cards").cast(_L).alias("n_cards"),
        "redacted",
        luhn_valid(
            (F.lit(4100000000000000) + F.col("doc_id")).cast("string")
        ).alias("is_valid"),
    )


SQL_CARD_AUDIT = """
WITH t AS (
  SELECT doc_id,
         CAST(4100000000000000 + doc_id AS VARCHAR) AS num,
         'ref ' || CAST(4100000000000000 + doc_id AS VARCHAR) || ' end' AS text
  FROM documents
),
v AS (
  SELECT *,
         (list_reduce(list_transform(generate_series(1, len(num)),
            i -> CASE WHEN i % 2 = 0 THEN
                   CASE WHEN 2 * CAST(substr(reverse(num), i, 1) AS INT) > 9
                        THEN 2 * CAST(substr(reverse(num), i, 1) AS INT) - 9
                        ELSE 2 * CAST(substr(reverse(num), i, 1) AS INT) END
                 ELSE CAST(substr(reverse(num), i, 1) AS INT) END),
            (a, b) -> a + b) % 10 = 0) AS is_valid
  FROM t
)
SELECT doc_id,
       CAST(CASE WHEN is_valid THEN 1 ELSE 0 END AS BIGINT) AS n_cards,
       CASE WHEN is_valid THEN replace(text, num, '[CARD]') ELSE text END
         AS redacted,
       is_valid
FROM v
"""


# ---------------------------------------------------------------------------

STAGED_QUERIES = {
    "quant_audit": q_quant_audit,
    "seq_layout": q_seq_layout,
    "contam_score": q_contam_score,
    "psl_domains": q_psl_domains,
    "card_audit": q_card_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "quant_audit": _sql_quant_audit(),
        "seq_layout": SQL_SEQ_LAYOUT,
        "contam_score": SQL_CONTAM_SCORE,
        "psl_domains": SQL_PSL_DOMAINS,
        "card_audit": SQL_CARD_AUDIT,
    }


# names each staged consolidation row replaces at registration time
STAGED_REPLACES = {
    "quant_audit": ("ann_int8", "pooled_ann"),
}
