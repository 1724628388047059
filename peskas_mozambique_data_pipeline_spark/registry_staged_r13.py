"""Round-13 STAGED registry row — pre-staged two rounds out because
its evidence is ready now (the NOTES pre-staging recipe; the r12
module's ceiling arithmetic means any r13 addition must be FUNDED by a
consolidation chosen from whatever tail actually rotates into r13 —
that pairing is deliberately left to the r12-close session, which can
see the window).

* ``pca_cov`` puts the exact-covariance surface
  (``operators.similarity.covariance_cells`` — the distributed half
  of ``embedding_pca``) under the hard oracle: integer-quantized
  component products summed as DECIMAL(38,0) over the upper triangle.
  The oracle replays the identical arithmetic with HUGEINT sums —
  any drift in quantization rounding, triangle masking or the
  partial-aggregation fold hash-mismatches.  Because the sums are
  exact integers in BOTH engines, this row is immune to the float
  reduction-order class entirely.

* ``audio_fp`` puts the acoustic fingerprint
  (``operators.multimodal.audio_fingerprint`` — Haitsma–Kalker
  energy-delta signs packed into 56-bit words, the audio tier of the
  perceptual-hash family) under the hard oracle on analytically
  synthesized PCM (the ``audio_audit`` discipline; lengths straddle
  the sub-window single-frame branch, which must yield NO fingerprint
  rows, and the multi-word boundary).  The oracle replays framing,
  exact-integer energies, the LEAD delta-sign bit and the low-bit-
  first shift packing in DuckDB; every quantity is an exact integer,
  so the row is immune to the float class entirely.  The banding-pair
  half of the audio near-dup surface reuses the machinery
  ``image_dups`` already hash-verifies.

* ``corpus_card`` (VERDICT r10 Next #6) puts the data-sheet card
  arithmetic (``plans.report.corpus_card_frames`` — per-zone
  count/token/char aggregates + the exact-integer permille retention
  window) under the hard oracle.  Zone frames are ANALYTIC views of
  ``documents`` (ingest → length filter → mod-key scrub → pack
  rollup), so the oracle replays every zone's defining predicate, the
  whitespace token count, and the ``(a − a % b)/b`` floor-division
  permille in plain SQL; the ``pos`` ordering literals are generated
  from ``ZONE_ORDER`` on BOTH sides so the card's DAG ordering cannot
  drift from the staged SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.report import ZONE_ORDER


def q_pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import covariance_cells
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cells = covariance_cells(emb, vec_col="embedding", quant=10**6)
    # exact integers travel as DIGIT STRINGS on both sides: DECIMAL vs
    # HUGEINT never enters the cross-engine type comparison
    return cells.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("s").cast("decimal(38,0)").cast("string").alias("s"),
    )


SQL_PCA_COV = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
cells AS (
  SELECT i.i AS i, j.j AS j,
         CAST(q.qv[i.i + 1] AS HUGEINT) * q.qv[j.j + 1] AS p
  FROM q,
       UNNEST(generate_series(0, len(qv) - 1)) AS i(i),
       UNNEST(generate_series(0, len(qv) - 1)) AS j(j)
  WHERE j.j >= i.i
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       CAST(SUM(p) AS VARCHAR) AS s
FROM cells GROUP BY i, j
"""


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.report import corpus_card_frames
    from .session import read_table

    # the four zone frames all derive from this one projection —
    # materialize it once (localCheckpoint, the retrieval_audit scan-
    # sharing discipline) so the card pays ONE parquet scan, not four
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    # analytic zone chain: each zone is a deterministic view of the one
    # before it, so retention permilles are exactly replayable.  The
    # upstream operators these stand in for (quality filter, scrub,
    # packing) each carry their OWN registry rows — this row verifies
    # the CARD arithmetic over the zone frames.
    filtered = docs.filter(F.length("text") >= 50)
    deduped = filtered.filter(F.col("doc_id") % 7 != 0)
    packs = deduped.groupBy((F.col("doc_id") % 8).alias("pack_id")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    card = corpus_card_frames(
        {
            "corpus_ingested": docs,
            "corpus_filtered": filtered,
            "corpus_deduped": deduped,
            "corpus_packs": packs,
        }
    )
    return card.select(
        "pos", "zone", "n_rows", "n_tokens", "n_chars",
        "retained_rows_permille",
    )


def _sql_corpus_card() -> str:
    pos = {z: ZONE_ORDER.index(z) for z in (
        "corpus_ingested", "corpus_filtered", "corpus_deduped", "corpus_packs"
    )}
    ntok = r"SUM(len(string_split_regex(trim(text), '\s+')))"
    return f"""
WITH ingested AS (SELECT doc_id, text FROM documents),
filtered AS (SELECT * FROM ingested WHERE length(text) >= 50),
deduped AS (SELECT * FROM filtered WHERE doc_id % 7 <> 0),
packs AS (SELECT doc_id % 8 AS pack_id, COUNT(*) AS n_docs
          FROM deduped GROUP BY 1),
zones AS (
  SELECT {pos['corpus_ingested']} AS pos, 'corpus_ingested' AS zone,
         COUNT(*) AS n_rows, {ntok} AS n_tokens,
         SUM(length(text)) AS n_chars
  FROM ingested
  UNION ALL
  SELECT {pos['corpus_filtered']}, 'corpus_filtered',
         COUNT(*), {ntok}, SUM(length(text))
  FROM filtered
  UNION ALL
  SELECT {pos['corpus_deduped']}, 'corpus_deduped',
         COUNT(*), {ntok}, SUM(length(text))
  FROM deduped
  UNION ALL
  SELECT {pos['corpus_packs']}, 'corpus_packs',
         COUNT(*), NULL, NULL
  FROM packs
)
SELECT CAST(pos AS INTEGER) AS pos, zone,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN prev IS NOT NULL AND prev > 0 THEN
              (n_rows * 1000 - (n_rows * 1000) % prev) / prev
            END AS BIGINT) AS retained_rows_permille
FROM (SELECT *, LAG(n_rows) OVER (ORDER BY pos) AS prev FROM zones)
"""


def q_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import audio_fingerprint
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    # lengths 100..4900: vec_id % 7 == 0 rows (n=100 < win=160) hit the
    # single-frame branch and must emit NO fingerprint; the longest hit
    # 60 frames = 59 bits -> two 56-bit words
    n = (100 + (F.col("vec_id") % 7) * 800).cast("int")
    samples = F.transform(
        F.sequence(F.lit(1), n),
        lambda j: (
            ((F.col("vec_id") * 7 + j.cast("long") * 13) % 201) - 100
        ).cast("long"),
    )
    # spread the id rows over every core BEFORE synthesizing the PCM
    # arrays: the one-file embeddings scan is a single task, and the
    # fingerprint pipeline is per-row array math with no shuffle of its
    # own, so without this barrier the whole query would execute on one
    # core (guide §2.5 — repartition right after a non-splittable read)
    pcm = (
        emb.select("vec_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", samples.alias("samples"))
    )
    out = audio_fingerprint(
        pcm, samples_col="samples", id_col="vec_id",
        window_ms=10, hop_ms=5, sample_rate=16_000, bits_per_word=56,
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("word_idx").cast("long").alias("word_idx"),
        F.col("fp").cast("long").alias("fp"),
    )


SQL_AUDIO_FP = """
WITH pcm AS (
  SELECT vec_id, CAST(100 + (vec_id % 7) * 800 AS BIGINT) AS n,
         list_transform(
           generate_series(1, CAST(100 + (vec_id % 7) * 800 AS BIGINT)),
           j -> CAST(((vec_id * 7 + j * 13) % 201) - 100 AS BIGINT)) AS s
  FROM embeddings
),
f AS (
  SELECT vec_id, s,
         CASE WHEN n >= 160 THEN (n - 160) // 80 + 1 ELSE 1 END AS nf,
         CASE WHEN n >= 160 THEN 160 ELSE n END AS fl
  FROM pcm
),
frames AS (
  SELECT vec_id, fi,
         list_reduce(list_transform(s[fi * 80 + 1 : fi * 80 + fl],
                                    x -> x * x), (a, b) -> a + b) AS energy
  FROM f, UNNEST(generate_series(0, CAST(nf - 1 AS BIGINT))) AS t(fi)
),
bits AS (
  SELECT vec_id, fi AS seq,
         LEAD(energy) OVER (PARTITION BY vec_id ORDER BY fi) AS nxt,
         energy
  FROM frames
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(seq // 56 AS BIGINT) AS word_idx,
       CAST(SUM(CASE WHEN nxt > energy THEN 1 ELSE 0 END
                * (CAST(1 AS BIGINT) << CAST(seq % 56 AS INTEGER)))
            AS BIGINT) AS fp
FROM bits
WHERE nxt IS NOT NULL
GROUP BY vec_id, seq // 56
"""


# ---------------------------------------------------------------------------
# The THREE funding consolidations, chosen at r12 close with sight of
# the rotating tail (VERDICT r11 Next #2).  Every leg sits in the r12
# tail (= the r11 head) and rotates into r13; each union calls the
# ORIGINAL query function verbatim and wraps the ORIGINAL SQL in CTEs,
# so all six operators stay hash-verified and drift is impossible.
# Arithmetic: r13 head = 50 tail − 6 legs + 3 unions + 3 new = 50;
# registry stays at the 100 ceiling.
#
# * ``docmeta_audit`` = ``doc_profile`` ⋈ ``doc_signature``: both are
#   per-document 1:1 metadata rows over the same key (quality/lang
#   profile; k-min + winnow fingerprints) — one join, zero row-count
#   change, every leg column preserved under the hash.
# * ``retrieval_audit`` = ``bm25_indexed`` + ``hybrid_rrf``: the two
#   retrieval-stack rows (inverted-index BM25 tier; RRF fusion of the
#   lexical + semantic tiers) — same family, stat-tagged union.
# * ``capsel_audit`` = ``source_cap`` + ``quality_topk``: the two
#   budget-selection rows (per-source hash cap; per-stratum quality
#   top-k) — same family, stat-tagged union.


def q_docmeta_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_staged import STAGED_QUERIES as _r9

    from .session import overlap_builds

    # independent legs — overlap their eager builds (guide §2.6)
    prof, sig = overlap_builds(
        lambda: _r9["doc_profile"](spark, sf_dir),
        lambda: _r9["doc_signature"](spark, sf_dir),
    )
    return prof.join(sig, "doc_id")


def _sql_docmeta_audit() -> str:
    from .registry_staged import STAGED_ORACLE_SQL as _r9sql

    return f"""
WITH a AS ({_r9sql['doc_profile']}),
b AS ({_r9sql['doc_signature']})
SELECT a.doc_id, a.n_tokens, a.mean_token_len, a.punct_ratio,
       a.stopword_ratio, a.quality_score, a.lang, a.pred_lang,
       a.score_de, a.score_en, a.score_es, a.score_fr,
       b.fingerprint, b.winnow_fp
FROM a JOIN b ON a.doc_id = b.doc_id
"""


def q_retrieval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_text import SPARK_QUERIES as _text
    from .session import overlap_builds

    # the two legs are deliberately DIFFERENT retrieval tiers (index
    # bm25 vs scan bm25 + cosine) with no shared frame, and each pays
    # its own eager checkpoints during build — overlap them (guide
    # §2.6) so leg b's jobs back-fill the cores leg a's tails free
    a_raw, b_raw = overlap_builds(
        lambda: _text["bm25_indexed"](spark, sf_dir),
        lambda: _text["hybrid_rrf"](spark, sf_dir),
    )
    a = a_raw.select(
        F.lit("bm25").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_terms_hit").cast("long").alias("n"),
        F.lit(None).cast("long").alias("n2"),
        F.col("score").cast("double").alias("v"),
    )
    b = b_raw.select(
        F.lit("rrf").alias("stat"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_lists").cast("long").alias("n"),
        F.col("rrf_nano").cast("long").alias("n2"),
        F.col("rrf_score").cast("double").alias("v"),
    )
    return a.unionByName(b)


def _sql_retrieval_audit() -> str:
    from .registry_text import ORACLE_SQL as _textsql

    return f"""
WITH a AS ({_textsql['bm25_indexed']}),
b AS ({_textsql['hybrid_rrf']})
SELECT 'bm25' AS stat, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_terms_hit AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n2,
       CAST(score AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'rrf', CAST(doc_id AS BIGINT), CAST(n_lists AS BIGINT),
       CAST(rrf_nano AS BIGINT), CAST(rrf_score AS DOUBLE)
FROM b
"""


def q_capsel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import SPARK_QUERIES as _cur
    from .registry_text import SPARK_QUERIES as _text

    a = _cur["source_cap"](spark, sf_dir).select(
        F.lit("cap").alias("stat"),
        F.col("source").cast("string").alias("k1"),
        F.lit(None).cast("long").alias("id"),
        F.col("n_kept").cast("long").alias("n"),
        F.col("n_dropped").cast("long").alias("n2"),
        F.col("frac_kept").cast("double").alias("v"),
    )
    b = _text["quality_topk"](spark, sf_dir).select(
        F.lit("topk").alias("stat"),
        F.col("lang").cast("string").alias("k1"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("rank").cast("long").alias("n"),
        F.lit(None).cast("long").alias("n2"),
        F.col("quality_score").cast("double").alias("v"),
    )
    return a.unionByName(b)


def _sql_capsel_audit() -> str:
    from .registry_curation import ORACLE_SQL as _cursql
    from .registry_text import ORACLE_SQL as _textsql

    return f"""
WITH a AS ({_cursql['source_cap']}),
b AS ({_textsql['quality_topk']})
SELECT 'cap' AS stat, CAST(source AS VARCHAR) AS k1,
       CAST(NULL AS BIGINT) AS id, CAST(n_kept AS BIGINT) AS n,
       CAST(n_dropped AS BIGINT) AS n2, CAST(frac_kept AS DOUBLE) AS v
FROM a
UNION ALL
SELECT 'topk', CAST(lang AS VARCHAR), CAST(doc_id AS BIGINT),
       CAST(rank AS BIGINT), CAST(NULL AS BIGINT),
       CAST(quality_score AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# nearest_audit — the haversine + nearest-site argmin under the hard
# oracle (VERDICT r11 Next #5; the geo_assign discipline).  Points
# synthesize deterministically from customer keys (the geo_assign
# spread, so every SF covers the whole fixture box); six literal
# landing sites are rendered from ONE python dict into BOTH engines.
# The oracle replays haversine (radians/sin/cos/asin/sqrt — the same
# libm-class chain as the registered ln rows; meters round to 3dp, and
# tools/boundary_audit-style margins are pytest-pinned: argmin gaps and
# range-gate margins sit >> any last-ulp drift) and the deterministic
# (distance, site) tie order nearest_site uses.

NEAREST_SITES: dict[str, tuple[float, float]] = {
    "maputo": (32.57, -25.97),
    "beira": (34.84, -19.84),
    "quelimane": (36.89, -17.88),
    "angoche": (39.91, -16.23),
    "nacala": (40.67, -14.56),
    "pemba": (40.52, -12.97),
}

_NEAREST_RANGE_M = 400_000.0


def _nearest_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import read_table

    cust = read_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("pid"),
        (F.lit(30.0) + (F.col("c_custkey") * 37 % 1000) / 100.0).alias("lon"),
        (F.lit(-26.0) + (F.col("c_custkey") * 53 % 700) / 50.0).alias("lat"),
    )


def q_nearest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.geo import nearest_site

    points = _nearest_points(spark, sf_dir)
    sites = spark.createDataFrame(
        [(name, lon, lat) for name, (lon, lat) in NEAREST_SITES.items()],
        "site string, site_lon double, site_lat double",
    )
    out = nearest_site(
        points,
        sites,
        id_col="pid",
        max_distance_m=_NEAREST_RANGE_M,
        keep_site_cols=["site"],
    )
    return out.select(
        "pid", "lon", "lat",
        F.col("site").cast("string").alias("site"),
        F.col("site_distance_m").cast("double").alias("site_distance_m"),
    )


def _sql_nearest_audit() -> str:
    site_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS site, {lon!r} AS slon, {lat!r} AS slat"
        for name, (lon, lat) in NEAREST_SITES.items()
    )
    # exactly operators/geo.py::haversine_m: pow-squared half-angle
    # sines, IUGG mean radius
    d = (
        "2 * 6371008.8 * asin(sqrt("
        "pow(sin(radians(s.slat - p.lat) / 2), 2)"
        " + cos(radians(p.lat)) * cos(radians(s.slat))"
        " * pow(sin(radians(s.slon - p.lon) / 2), 2)))"
    )
    return f"""
WITH points AS (
  SELECT c_custkey AS pid,
         30.0 + (c_custkey * 37 % 1000) / 100.0 AS lon,
         -26.0 + (c_custkey * 53 % 700) / 50.0 AS lat
  FROM customer
),
sites AS ({site_rows}),
cand AS (
  SELECT p.pid, s.site, {d} AS dm
  FROM points p CROSS JOIN sites s
),
pick AS (
  SELECT pid, site, dm,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY dm, site) AS rn
  FROM cand WHERE dm <= {_NEAREST_RANGE_M!r}
)
SELECT p.pid, p.lon, p.lat, CAST(k.site AS VARCHAR) AS site,
       CAST(round(k.dm, 3) AS DOUBLE) AS site_distance_m
FROM points p LEFT JOIN (SELECT * FROM pick WHERE rn = 1) k
  ON p.pid = k.pid
"""


# ---------------------------------------------------------------------------
# release_fold — the release-integrity manifest fold under the hard
# oracle (VERDICT r11 Next #6).  ``io/parquet_io.py::release_fold``
# groups documents by source and folds the engine-portable md5 row
# fingerprint (15 hex digits → exact integer, summed as DECIMAL(38,0)
# vs HUGEINT — digit-string compared, so no float ever enters).  The
# same arithmetic already has a digit-for-digit DuckDB parity pytest
# (tests/test_io.py::test_md5_fingerprint_fold_duckdb_parity); this row
# carries it to the driver signal.


def q_release_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .io.parquet_io import release_fold
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return release_fold(docs, ["source"]).select(
        F.col("source").cast("string").alias("source"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("content_fp").cast("string").alias("content_fp"),
    )


def _sql_release_fold() -> str:
    # ALL document columns sorted by name, the release_fold contract
    cols = ["doc_id", "lang", "n_chars", "source", "text"]
    key = "concat_ws(chr(31), " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in sorted(cols)
    ) + ")"
    return f"""
SELECT CAST(source AS VARCHAR) AS source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(('0x' || substr(md5({key}), 1, 15))
                     AS BIGINT)::HUGEINT) AS VARCHAR) AS content_fp
FROM documents GROUP BY source
"""


STAGED_QUERIES = {
    "pca_cov": q_pca_cov,
    "audio_fp": q_audio_fp,
    "corpus_card": q_corpus_card,
    "docmeta_audit": q_docmeta_audit,
    "retrieval_audit": q_retrieval_audit,
    "capsel_audit": q_capsel_audit,
    "nearest_audit": q_nearest_audit,
    "release_fold": q_release_fold,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "pca_cov": SQL_PCA_COV,
        "audio_fp": SQL_AUDIO_FP,
        "corpus_card": _sql_corpus_card(),
        "docmeta_audit": _sql_docmeta_audit(),
        "retrieval_audit": _sql_retrieval_audit(),
        "capsel_audit": _sql_capsel_audit(),
        "nearest_audit": _sql_nearest_audit(),
        "release_fold": _sql_release_fold(),
    }


# names each staged consolidation row replaces at registration time
# (all six legs sit in the r12 tail and rotate into the r13 head).
# Registering the three funded NEW rows (pca_cov, audio_fp,
# corpus_card) uses these three unions: 50 − 6 + 3 + 3 = 50.  The two
# FURTHER staged rows (nearest_audit, release_fold) need two more
# consolidations chosen at r13 close with sight of that round's tail —
# or they register at r14 funded from the then-rotating set.
STAGED_REPLACES: dict[str, tuple[str, str]] = {
    "docmeta_audit": ("doc_profile", "doc_signature"),
    "retrieval_audit": ("bm25_indexed", "hybrid_rrf"),
    "capsel_audit": ("source_cap", "quality_topk"),
}
