"""Round-14 STAGED registry row — pre-staged two rounds out because
its evidence is ready now (the NOTES pre-staging recipe; the registry
sits AT the 100 ceiling, so this row registers only with a funding
consolidation chosen by the session that can see the r14 tail).

* ``main_content_audit`` puts the block-level boilerplate filter
  (``operators/html.py::extract_main_content`` — the jusText-lite
  per-block min-chars + max-link-density keep rule, VERDICT r11
  Next #8) under the hard oracle by the ``html_extract`` ROUND-TRIP
  discipline: each document's text is entity-encoded and wrapped in a
  chrome-heavy page template (title, script, a nav list of 3+id%3
  all-anchor items, the prose block with one inline link, a
  sub-min-chars junk block, an all-anchor footer).  The template makes
  every chrome block's keep decision STRUCTURAL (all-anchor text →
  link share 1.0 > 0.5 regardless of id digits; 'ok' is always
  sub-min-chars; the title block is short), so the only DATA-dependent
  decision is the prose block's own min-chars gate (raised to 70 so
  real corpus texts sit on BOTH sides at every SF) — which the oracle
  REPLAYS (``length >= 70`` over the same whitespace-normalized
  rendering) together with its link-density comparison in plain SQL,
  never parsing HTML.  The rendered prose is stated analytically
  (text ‖ the inline-link tail with the tag-strip double spaces, run
  through the SAME five-rule whitespace chain in DuckDB — the shared
  Java/RE2 regex subset).  A second verified column counts the
  rendered blocks (K+4, analytic), pinning the splitter itself.

* ``diff_audit`` puts the row-level release diff
  (``io/parquet_io.py::row_diff`` — CDC-grade added/removed/changed
  statuses from md5 fingerprint-multiset folds around one full-outer
  join) under the hard oracle against an ANALYTIC "next release" view
  of documents; the oracle states the statuses with pure id
  arithmetic and never touches a fingerprint, so the operator's hash
  machinery must rediscover the analytic truth (see its section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S = "string"
_L = "long"


def q_main_content_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import html as html_ops
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast(_S)
    enc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    # 3 + id%3 nav items, every one pure anchor text (link share 1.0)
    nav = F.aggregate(
        F.sequence(F.lit(0), (F.col("doc_id") % 3 + 2).cast("int")),
        F.lit(""),
        lambda acc, i: F.concat(
            acc,
            F.lit('<li class="nav"><a href="/s/'),
            i.cast(_S),
            F.lit('">Navigation section '),
            sid,
            F.lit(" number "),
            i.cast(_S),
            F.lit(" link</a></li>"),
        ),
    )
    page = F.concat(
        F.lit("<html><head><title>T "),
        sid,
        F.lit('</title><script>var x = "<p>no</p>";</script></head><body><ul>'),
        nav,
        F.lit("</ul><p>"),
        enc,
        F.lit(' see <a href="/r">annex '),
        (F.col("doc_id") % 5).cast(_S),
        F.lit("</a> now.</p><div>ok</div>"),
        F.lit('<div class="f"><a href="/f">Footer farm of pure anchor text '),
        sid,
        F.lit(" with plenty of characters</a></div></body></html>"),
    )
    # round-robin spread BEFORE the heavy per-row work: the one-file
    # documents scan is a single task, and page synthesis + HTML block
    # parsing would otherwise run serially on one core (the audio_fp
    # placement fix, r14 guide §2.4)
    pages = docs.select("doc_id", page.alias("text")).repartition(
        spark.sparkContext.defaultParallelism
    )
    # ONE block_texts parse feeds BOTH outputs: the former shape ran
    # extract_main_content's parse for main_text and a second full
    # parse for n_blocks.  The blocks array is let-bound as a transform
    # lambda variable (evaluated once per row) and both derived values
    # emitted through an inline() barrier.  min_chars=70 so the prose
    # gate is DATA-dependent at every SF (the corpus holds 47..52-char
    # texts that must drop); expressions identical to
    # extract_main_content(min_chars=70) + size(block_texts(text)).
    def _row(blocks):
        kept = F.filter(
            blocks,
            lambda s: (F.length(s["text"]) >= 70)
            & (s["link_chars"] <= F.length(s["text"]) * F.lit(0.5)),
        )
        return F.struct(
            F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
            .cast(_S)
            .alias("main_text"),
            F.size(blocks).cast(_L).alias("n_blocks"),
        )

    return pages.select(
        F.col("doc_id").cast(_L).alias("doc_id"),
        F.inline(
            F.transform(F.array(html_ops.block_texts(F.col("text"))), _row)
        ),
    )


# the SAME five-rule whitespace chain as the html_extract oracle
_WS = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace({x}, '[ \\t\\r\\f]+', ' ', 'g'), ' ?\\n ?', chr(10), 'g'),"
    " '\\n+', chr(10), 'g'), '^[\\s]+', ''), '[\\s]+$', '')"
)

SQL_MAIN_CONTENT_AUDIT = f"""
WITH rendered AS (
  SELECT doc_id,
         {_WS.format(x="text || ' see  annex ' || CAST(doc_id % 5 AS VARCHAR) || '  now.'")}
           AS prose,
         CAST(length('annex ' || CAST(doc_id % 5 AS VARCHAR)) AS BIGINT)
           AS link_chars,
         CAST(3 + doc_id % 3 AS BIGINT) AS k_nav
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN length(prose) >= 70
                 AND link_chars <= length(prose) * 0.5
            THEN prose ELSE '' END AS main_text,
       -- title + k_nav all-anchor items + prose + 'ok' junk + footer
       CAST(k_nav + 4 AS BIGINT) AS n_blocks
FROM rendered
"""


# ---------------------------------------------------------------------------
# diff_audit — the row-level release diff (io/parquet_io.py::row_diff)
# under the hard oracle.  "New release" is an ANALYTIC view of
# documents: ids ≡0 mod 11 dropped (→ removed), ids ≡0 mod 7 among the
# survivors get their text rewritten (→ changed), and 25 synthetic
# rows append above the id space (→ added); everything else must be
# ABSENT from the diff.  Statuses are therefore fully determined by id
# arithmetic, so the oracle states them with CASE/UNION — it never
# recomputes a fingerprint, which is exactly the point: the operator's
# md5-multiset machinery must REDISCOVER the analytic truth.


def q_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .io.parquet_io import row_diff
    from .session import read_table

    old = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    survivors = old.filter(F.col("doc_id") % 11 != 0)
    modified = survivors.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("REVISED "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    added = old.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("doc_id").cast(_S)).alias("text"),
        F.lit("src_new").alias("source"),
    )
    new = modified.unionByName(added)
    out = row_diff(old, new, ["doc_id"])
    return out.select(
        F.col("doc_id").cast(_L).alias("doc_id"),
        F.col("status").cast(_S).alias("status"),
    )


SQL_DIFF_AUDIT = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'removed' AS status
FROM documents WHERE doc_id % 11 = 0
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'changed'
FROM documents WHERE doc_id % 11 <> 0 AND doc_id % 7 = 0
UNION ALL
SELECT CAST(doc_id + 1000000 AS BIGINT), 'added'
FROM documents WHERE doc_id < 25
"""


# ---------------------------------------------------------------------------
# The TWO funding consolidations, chosen at r13 close with sight of the
# rotating tail (VERDICT r12 Next #3; both pairs were listed as
# candidates in NOTES at r12 close).  Every leg sits in the r13 tail
# (= the r12 head) and rotates into r14; each union calls the ORIGINAL
# query function verbatim and wraps the ORIGINAL SQL in CTEs, so all
# four operators stay hash-verified and drift is impossible.
# Arithmetic: r14 head = 50 tail − 4 legs + 2 unions + 2 funded new
# rows (main_content_audit, diff_audit) = 50; registry stays 100.
#
# * ``bandpairs_audit`` = ``minhash_dedup`` + ``simhash_pairs``: the
#   two banded near-dup PAIR generators over documents (MinHash-LSH
#   jaccard legs; SimHash hamming legs of one family).
# * ``dedupfam_audit`` = ``dedup_exact`` + ``dedup_clusters``: the
#   exact-digest groups and the connected-component rollup — the two
#   halves of the exact-dedup surface.


def q_bandpairs_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 fused pipeline (guide §2.4): the two legs each tokenized the
    # corpus and each paid their own checkpoint (minhash_dedup's
    # shingle frame + simhash_pairs' signature frame — 2 scans, 2
    # materialization jobs).  ONE tokenize pass now feeds ONE combo
    # checkpoint carrying BOTH per-doc values (the minhash shingle-hash
    # set and the simhash signature); the minhash candidate/verify
    # branches and the simhash band self-join all read projections of
    # that single materialization.  Expressions are the operators'
    # own (dedup.shingle_h32 / token_hashes32 / simhash32_from_hashes /
    # minhash_candidates_from_hashes / jaccard_verify_hashed /
    # simhash_pairs_from_sigs), so rows are bit-identical to the
    # two-leg form (parity collect-hashed at sf0.1; measured 2.36 →
    # 1.82 s min).  The retired legs still run verbatim standalone in
    # the local gate.
    from .operators import dedup as dedup_ops
    from .operators.text import tokens
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("_t")).repartition(
        spark.sparkContext.defaultParallelism
    )
    combo = toks.select(
        F.col("doc_id"),
        dedup_ops.shingle_h32(F.col("_t"), 5).alias("_h32"),
        dedup_ops.simhash32_from_hashes(
            dedup_ops.token_hashes32(F.col("_t"))
        ).alias("sig"),
    ).localCheckpoint()
    hashed = combo.select("doc_id", "_h32").filter(F.size("_h32") > 0)
    pairs = dedup_ops.minhash_candidates_from_hashes(hashed, n_hashes=8, bands=4)
    verified = dedup_ops.jaccard_verify_hashed(hashed, pairs)
    a = verified.select(
        F.lit("jaccard").alias("stat"),
        F.col("id_a").cast(_L).alias("id_a"),
        F.col("id_b").cast(_L).alias("id_b"),
        F.lit(None).cast(_L).alias("n"),
        F.col("jaccard").cast("double").alias("v"),
    )
    sp = dedup_ops.simhash_pairs_from_sigs(
        combo.select("doc_id", "sig"), max_hamming=8
    )
    b = sp.select(
        F.lit("hamming").alias("stat"),
        F.col("id_a").cast(_L).alias("id_a"),
        F.col("id_b").cast(_L).alias("id_b"),
        F.col("hamming").cast(_L).alias("n"),
        F.lit(None).cast("double").alias("v"),
    )
    return a.unionByName(b)


def _sql_bandpairs_audit() -> str:
    from .registry_text import SQL_MINHASH_DEDUP, SQL_SIMHASH_PAIRS

    return f"""
WITH a AS ({SQL_MINHASH_DEDUP}),
b AS ({SQL_SIMHASH_PAIRS})
SELECT 'jaccard' AS stat, CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b, CAST(NULL AS BIGINT) AS n,
       CAST(jaccard AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'hamming', CAST(id_a AS BIGINT), CAST(id_b AS BIGINT),
       CAST(hamming AS BIGINT), CAST(NULL AS DOUBLE)
FROM b
"""


def q_dedupfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 fused pipeline (guide §2.4, the bandpairs_audit pattern): the
    # exact leg re-scanned the corpus just to md5 an 8-token prefix
    # while the clusters leg built its own shingle checkpoint.  ONE
    # scan now computes the exact digest (cheap, one md5 per row —
    # runs below the spread exchange with the tokenize) AND the
    # shingle-hash set; one combo checkpoint feeds the exact groupBy
    # and the whole minhash+CC chain.  Expressions are the operators'
    # own (dedup.exact_digest / shingle_h32 / exact_dup_groups via
    # digest_col) — rows bit-identical to the two-leg form; the
    # retired legs still run verbatim standalone in the local gate.
    from .operators import dedup as dedup_ops
    from .operators.text import tokens
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        dedup_ops.exact_digest("text", normalize=True, prefix_tokens=8).alias(
            "digest"
        ),
        tokens(F.col("text")).alias("_t"),
    ).repartition(spark.sparkContext.defaultParallelism)
    combo = toks.select(
        F.col("doc_id"),
        F.col("digest"),
        dedup_ops.shingle_h32(F.col("_t"), 5).alias("_h32"),
    ).localCheckpoint()

    groups = dedup_ops.exact_dup_groups(
        combo, digest_col="digest"
    ).select(
        "digest",
        "group_size",
        F.array_join(
            F.transform(F.col("doc_ids"), lambda x: x.cast("string")), ","
        ).alias("members"),
    )
    a = groups.select(
        F.lit("exact").alias("stat"),
        F.col("digest").cast(_S).alias("k1"),
        F.col("group_size").cast(_L).alias("n"),
        F.col("members").cast(_S).alias("members"),
    )

    hashed = combo.select("doc_id", "_h32").filter(F.size("_h32") > 0)
    pairs = dedup_ops.minhash_candidates_from_hashes(hashed, n_hashes=8, bands=4)
    verified = dedup_ops.jaccard_verify_hashed(hashed, pairs).filter(
        F.col("jaccard") >= 0.5
    )
    clusters = dedup_ops.duplicate_clusters(verified)
    b = clusters.select(
        F.lit("cluster").alias("stat"),
        F.col("component_id").cast(_S).alias("k1"),
        F.col("n_members").cast(_L).alias("n"),
        F.col("members").cast(_S).alias("members"),
    )
    return a.unionByName(b)


def _sql_dedupfam_audit() -> str:
    from .registry_text import SQL_DEDUP_CLUSTERS, SQL_DEDUP_EXACT

    return f"""
WITH a AS ({SQL_DEDUP_EXACT}),
b AS ({SQL_DEDUP_CLUSTERS})
SELECT 'exact' AS stat, CAST(digest AS VARCHAR) AS k1,
       CAST(group_size AS BIGINT) AS n, CAST(members AS VARCHAR) AS members
FROM a
UNION ALL
SELECT 'cluster', CAST(component_id AS VARCHAR),
       CAST(n_members AS BIGINT), CAST(members AS VARCHAR)
FROM b
"""


STAGED_QUERIES = {
    "main_content_audit": q_main_content_audit,
    "diff_audit": q_diff_audit,
    "bandpairs_audit": q_bandpairs_audit,
    "dedupfam_audit": q_dedupfam_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "main_content_audit": SQL_MAIN_CONTENT_AUDIT,
        "diff_audit": SQL_DIFF_AUDIT,
        "bandpairs_audit": _sql_bandpairs_audit(),
        "dedupfam_audit": _sql_dedupfam_audit(),
    }


# names each staged consolidation row replaces at registration time
# (all four legs sit in the r13 tail and rotate into the r14 head):
# 50 − 4 + 2 + 2 = 50.
STAGED_REPLACES: dict[str, tuple[str, str]] = {
    "bandpairs_audit": ("minhash_dedup", "simhash_pairs"),
    "dedupfam_audit": ("dedup_exact", "dedup_clusters"),
}
