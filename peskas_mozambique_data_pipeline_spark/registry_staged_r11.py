"""Round-11 STAGED registry rows (VERDICT r9 Next #8 / the NOTES r11
recipe): consolidation unions prepared one round ahead with bit-exact
two-scale-factor oracle evidence (``tests/test_registry_staged_r11.py``),
so r11 registration is a mechanical diff.

Both rows pair queries that sit in the CURRENT rotation tail — the 47
r9-head rows that rotate into the r11 driver window — because window
arithmetic only credits consolidations made within the rotating-in set
(47 − 4 + 2 = 45 rotating rows after the swap, leaving 5 slots for
new r11 rows).

* ``governance_audit`` = ``corpus_diff`` + ``token_drift``: both are
  corpus-governance comparisons (snapshot diff counts / per-group token
  KL against the pooled corpus).
* ``neardup_audit`` = ``jaccard_exact`` + ``embedding_near_dup``: both
  emit (id_a, id_b, similarity) near-duplicate pair tables — the
  lexical and the embedding modality of the same surface.

Plus one NEW operator row: ``fetch_audit`` puts the r10 politeness
scheduler (``web.fetch_schedule``) under the hard oracle — synthesized
per-host frontier URLs, an analytic delay table, and the per-host
slot assignment replayed as a windowed ROW_NUMBER in SQL.

Each union leg calls the ORIGINAL registered query function verbatim
and the oracle wraps the ORIGINAL oracle SQL in a CTE (the
``registry_audit`` discipline), so the consolidated operators stay
hash-verified and staged-vs-registered drift is impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"
_D = "double"


def _null(t: str):
    return F.lit(None).cast(t)


# ---------------------------------------------------------------------------
# governance_audit = corpus_diff + token_drift


def q_governance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_corpus_diff, q_token_drift

    a = q_corpus_diff(spark, sf_dir).select(
        F.lit("diff").alias("stat"),
        F.col("source").cast(_S).alias("key1"),
        F.col("status").cast(_S).alias("key2"),
        F.col("n_docs").cast(_L).alias("n1"),
        _null(_L).alias("n2"),
        _null(_D).alias("v"),
    )
    b = q_token_drift(spark, sf_dir).select(
        F.lit("drift").alias("stat"),
        F.col("lang").cast(_S).alias("key1"),
        _null(_S).alias("key2"),
        F.col("n_tokens").cast(_L).alias("n1"),
        F.col("vocab").cast(_L).alias("n2"),
        F.col("kl_to_corpus").cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_governance_audit() -> str:
    from .registry_curation import SQL_CORPUS_DIFF, SQL_TOKEN_DRIFT

    return f"""
WITH a AS ({SQL_CORPUS_DIFF}),
b AS ({SQL_TOKEN_DRIFT})
SELECT 'diff' AS stat, CAST(source AS VARCHAR) AS key1,
       CAST(status AS VARCHAR) AS key2, CAST(n_docs AS BIGINT) AS n1,
       CAST(NULL AS BIGINT) AS n2, CAST(NULL AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'drift', CAST(lang AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(n_tokens AS BIGINT), CAST(vocab AS BIGINT),
       CAST(kl_to_corpus AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# neardup_audit = jaccard_exact + embedding_near_dup


def q_neardup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import q_embedding_near_dup, q_jaccard_exact

    a = q_jaccard_exact(spark, sf_dir).select(
        F.lit("jaccard").alias("stat"),
        _null(_L).alias("lbl"),
        F.col("id_a").cast(_L).alias("id_a"),
        F.col("id_b").cast(_L).alias("id_b"),
        F.col("jaccard").cast(_D).alias("v"),
    )
    b = q_embedding_near_dup(spark, sf_dir).select(
        F.lit("cosine").alias("stat"),
        F.col("label").cast(_L).alias("lbl"),
        F.col("id_a").cast(_L).alias("id_a"),
        F.col("id_b").cast(_L).alias("id_b"),
        F.col("cosine_sim").cast(_D).alias("v"),
    )
    return a.unionByName(b)


def _sql_neardup_audit() -> str:
    from .registry_text import SQL_EMBEDDING_NEAR_DUP, SQL_JACCARD_EXACT

    return f"""
WITH a AS ({SQL_JACCARD_EXACT}),
b AS ({SQL_EMBEDDING_NEAR_DUP})
SELECT 'jaccard' AS stat, CAST(NULL AS BIGINT) AS lbl,
       CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(jaccard AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'cosine', CAST(label AS BIGINT), CAST(id_a AS BIGINT),
       CAST(id_b AS BIGINT), CAST(cosine_sim AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# fetch_audit — per-host politeness scheduling under the hard oracle.
# Frontier URLs synthesize from documents (host = doc_id % 7, path
# unique per doc); the delay table is analytic ((host_index % 3 + 1) ×
# 500 ms), so the oracle replays host derivation, the broadcast delay
# lookup and the per-host slot window exactly — URL ordering is ASCII,
# binary-collated identically on both engines.


def q_fetch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.web import fetch_schedule
    from .session import read_table

    frontier = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://crawl"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    delays = spark.range(7).select(
        F.concat(
            F.lit("crawl"), F.col("id").cast("string"), F.lit(".example.org")
        ).alias("host"),
        ((F.col("id") % 3 + 1) * 500).cast("long").alias("crawl_delay_ms"),
    )
    out = fetch_schedule(frontier, delays)
    return out.select(
        "doc_id", "url", F.col("fetch_offset_ms").cast(_L).alias("fetch_offset_ms")
    )


SQL_FETCH_AUDIT = """
WITH f AS (
  SELECT doc_id,
         'http://crawl' || CAST(doc_id % 7 AS VARCHAR)
         || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
         'crawl' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS h
  FROM documents
),
d AS (
  SELECT 'crawl' || CAST(i AS VARCHAR) || '.example.org' AS host,
         CAST((i % 3 + 1) * 500 AS BIGINT) AS delay
  FROM generate_series(0, 6) AS t(i)
)
SELECT f.doc_id, f.url,
       CAST((ROW_NUMBER() OVER (PARTITION BY f.h ORDER BY f.url) - 1)
            * COALESCE(d.delay, 1000) AS BIGINT) AS fetch_offset_ms
FROM f LEFT JOIN d ON f.h = d.host
"""


# ---------------------------------------------------------------------------

STAGED_QUERIES = {
    "governance_audit": q_governance_audit,
    "neardup_audit": q_neardup_audit,
    "fetch_audit": q_fetch_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "governance_audit": _sql_governance_audit(),
        "neardup_audit": _sql_neardup_audit(),
        "fetch_audit": SQL_FETCH_AUDIT,
    }


# names each staged consolidation row replaces at registration time
STAGED_REPLACES = {
    "governance_audit": ("corpus_diff", "token_drift"),
    "neardup_audit": ("jaccard_exact", "embedding_near_dup"),
}
