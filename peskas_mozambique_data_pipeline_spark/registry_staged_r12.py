"""Round-12 STAGED registry rows — the NOTES pre-staging recipe
applied one round further out, so r12 registration starts from
bit-exact two-scale-factor evidence just like r10's and r11's swaps
did (``tests/test_registry_staged_r12.py``).

Window/ceiling arithmetic: the r11 recipe lands the registry at 98
with 2 slots of headroom under the 100 ceiling.  The FOUR staged rows
below fit exactly: two new rows use the headroom, the
``sketchfam_audit`` consolidation (−2 legs, +1 union) funds the third
new row — 98 − 2 + 1 + 3 = 100, at the ceiling (r13 then requires
consolidations, as the cadence already assumes).

* ``diversity_sample`` puts cluster-balanced diversity sampling
  (``operators.curation.cluster_balanced_sample`` — the DataComp-style
  keep-the-topic-mix budget sampler) under the hard oracle.  Strata
  are nearest-centroid assignments against the FIXED ``vec_id < 8``
  shared-centroid table (the ``drift_audit`` discipline: no k-means
  replay, one assignment pass), quality is analytic
  (``(vec_id·37+11) mod 997``), the budget is a literal 120 — a real
  constraint at every SF (embeddings: 500/500/2000 rows).  The oracle
  replays the assignment, the largest-remainder (Hamilton)
  apportionment in BIGINT arithmetic, and the per-cluster quality
  top-k; any drift in apportionment rounding, leftover-seat ranking
  or tie-breaks hash-mismatches.
* ``audio_audit`` pins the audio family's JVM hot path (see its
  section below).
* ``sketchfam_audit`` = ``sketch_audit`` + ``hist_quantiles``: the
  register-sized-sketch family consolidation funding video_audit's
  slot.
* ``video_audit`` puts ``multimodal.raw_video_frames`` (real binary
  frame slicing) under the hard oracle via the hex-twin replay (see
  its section below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIVERSITY_BUDGET = 120


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import cluster_balanced_sample
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    docs = emb.select(
        "vec_id",
        "embedding",
        ((F.col("vec_id") * 37 + 11) % 997).cast("long").alias("quality"),
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    out = cluster_balanced_sample(
        docs, cents, budget=_DIVERSITY_BUDGET, quality_col="quality",
        id_col="vec_id",
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("int").alias("centroid_id"),
        F.col("quality").cast("long").alias("quality"),
    )


def _sql_diversity_sample() -> str:
    from .registry_text import _sql_dot, _sql_norm

    cos = (
        f"({_sql_dot('e.embedding', 'c.centroid')}"
        f" / ({_sql_norm('e.embedding')} * {_sql_norm('c.centroid')}))"
    )
    b = _DIVERSITY_BUDGET
    return f"""
WITH cents AS (
  SELECT CAST(vec_id AS INTEGER) AS centroid_id, embedding AS centroid
  FROM embeddings WHERE vec_id < 8
),
assign AS (
  SELECT vec_id, quality, centroid_id FROM (
    SELECT e.vec_id, CAST((e.vec_id * 37 + 11) % 997 AS BIGINT) AS quality,
           c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.centroid_id) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
counts AS (SELECT centroid_id, COUNT(*) AS n FROM assign GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
q AS (
  SELECT centroid_id, n,
         CAST({b} AS BIGINT) * n // t AS quota,
         CAST({b} AS BIGINT) * n % t AS rem
  FROM counts, tot
),
qs AS (SELECT CAST(SUM(quota) AS BIGINT) AS qsum FROM q),
alloc AS (
  SELECT centroid_id,
         quota + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, centroid_id)
                           <= CAST({b} AS BIGINT) - qsum
                      THEN 1 ELSE 0 END AS alloc
  FROM q, qs
),
ranked AS (
  SELECT a.vec_id, a.centroid_id, a.quality, al.alloc,
         ROW_NUMBER() OVER (
           PARTITION BY a.centroid_id
           ORDER BY a.quality DESC, a.vec_id) AS rn
  FROM assign a JOIN alloc al ON a.centroid_id = al.centroid_id
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(centroid_id AS INTEGER) AS centroid_id,
       CAST(quality AS BIGINT) AS quality
FROM ranked WHERE rn <= alloc
"""


# ---------------------------------------------------------------------------
# audio_audit — the audio family's first hard oracle row, the
# ``image_dups`` discipline applied to sound: the binary front door
# (``audio_windows``: np.frombuffer over blobs) cannot replay in SQL,
# so the row pins the JVM array-input twin
# (``multimodal.pcm_frame_features`` — pytest-proven frame-for-frame
# equal to the numpy path on identical PCM) over analytically
# synthesized signals.  Per-asset lengths 100..580 straddle the
# 160-sample window so BOTH framing branches (sliding windows and the
# single short whole-signal frame) are under the hash; every output is
# BIGINT (energy = Σx², zero-crossings), no floats anywhere.


def q_audio_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import pcm_frame_features
    from .session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = (100 + (F.col("vec_id") % 9) * 60).cast("int")
    samples = F.transform(
        F.sequence(F.lit(1), n),
        lambda j: (
            ((F.col("vec_id") * 7 + j.cast("long") * 13) % 201) - 100
        ).cast("long"),
    )
    pcm = emb.select("vec_id", samples.alias("samples"))
    out = pcm_frame_features(
        pcm, samples_col="samples", id_col="vec_id",
        window_ms=10, hop_ms=5, sample_rate=16_000,
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("win_start_ms").cast("long").alias("win_start_ms"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("energy").cast("long").alias("energy"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
    )


SQL_AUDIO_AUDIT = """
WITH pcm AS (
  SELECT vec_id, CAST(100 + (vec_id % 9) * 60 AS BIGINT) AS n,
         list_transform(
           generate_series(1, CAST(100 + (vec_id % 9) * 60 AS BIGINT)),
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
  SELECT vec_id, s, fl, fi * 80 AS start,
         s[fi * 80 + 1 : fi * 80 + fl] AS sl
  FROM f, UNNEST(generate_series(0, CAST(nf - 1 AS BIGINT))) AS t(fi)
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(start * 1000 // 16000 AS BIGINT) AS win_start_ms,
       CAST(fl AS BIGINT) AS n_samples,
       CAST(list_reduce(list_transform(sl, x -> x * x), (a, b) -> a + b)
            AS BIGINT) AS energy,
       CAST(CASE WHEN fl > 1 THEN list_reduce(
              list_transform(generate_series(1, CAST(fl - 1 AS BIGINT)),
                i -> CASE WHEN (sl[i] < 0) != (sl[i + 1] < 0)
                          THEN 1 ELSE 0 END),
              (a, b) -> a + b)
            ELSE 0 END AS BIGINT) AS zero_crossings
FROM frames
"""


# ---------------------------------------------------------------------------
# sketchfam_audit = sketch_audit + hist_quantiles: both are
# register-sized-sketch rows (HLL/CMS estimates vs exact counts; the
# binned-histogram quantile estimator) — same family, merged to fund
# the window/ceiling slot video_audit uses.  Legs verbatim, oracle
# wraps the registered SQL.


def q_sketchfam_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_curation import q_hist_quantiles, q_sketch_audit
    from .session import overlap_builds

    # independent legs (documents token sketches vs lineitem histogram)
    # — overlap their eager builds (guide §2.6)
    a_raw, b_raw = overlap_builds(
        lambda: q_sketch_audit(spark, sf_dir),
        lambda: q_hist_quantiles(spark, sf_dir),
    )
    a = a_raw.select(
        F.col("sketch").alias("stat"),
        F.col("key").alias("key1"),
        F.lit(None).cast("double").alias("q"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("estimate").cast("double").alias("estimate"),
    )
    b = b_raw.select(
        F.lit("hist").alias("stat"),
        F.col("o_orderpriority").alias("key1"),
        F.col("quantile").cast("double").alias("q"),
        F.lit(None).cast("long").alias("n_exact"),
        F.col("estimate").cast("double").alias("estimate"),
    )
    return a.unionByName(b)


def _sql_sketchfam_audit() -> str:
    from .registry_curation import SQL_HIST_QUANTILES, SQL_SKETCH_AUDIT

    return f"""
WITH a AS ({SQL_SKETCH_AUDIT}),
b AS ({SQL_HIST_QUANTILES})
SELECT sketch AS stat, key AS key1, CAST(NULL AS DOUBLE) AS q,
       CAST(n_exact AS BIGINT) AS n_exact, CAST(estimate AS DOUBLE) AS estimate
FROM a
UNION ALL
SELECT 'hist', o_orderpriority, CAST(quantile AS DOUBLE),
       CAST(NULL AS BIGINT), CAST(estimate AS DOUBLE)
FROM b
"""


# ---------------------------------------------------------------------------
# video_audit — the video frame-sampling surface under the hard
# oracle.  ``multimodal.raw_video_frames`` runs VERBATIM over raw
# video blobs synthesized engine-side (per-doc byte strings built as
# hex → ``unhex`` → real BINARY content, so the Spark side exercises
# genuine binary ``substring`` slicing), with per-doc frame counts
# 3..5, a sampling stride of 2 and a ragged sub-frame TAIL (doc_id%2
# bytes) that truncation must ignore.  DuckDB cannot slice BLOBs, so
# the oracle replays the arithmetic on the HEX TWIN of the same bytes
# (2 hex chars per byte, VARCHAR substring) — byte-for-byte
# equivalent because both sides emit frames AS uppercase hex.


def q_video_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import raw_video_frames
    from .session import read_table

    docs = read_table(spark, sf_dir, "documents")
    hexstr = F.expr(
        "array_join(transform(sequence(0, CAST((3 + doc_id % 3) * 12"
        " + doc_id % 2 AS INT) - 1),"
        " j -> lpad(hex(CAST((doc_id * 7 + (j DIV 12) * 13 + (j % 12) * 5)"
        " % 251 AS INT)), 2, '0')), '')"
    )
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.unhex(hexstr).alias("content"),
    )
    frames = raw_video_frames(
        media, width=4, height=3, channels=1, fps=10, every_ms=200
    )
    return frames.select(
        F.col("asset_id").cast("long").alias("asset_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_ms").cast("long").alias("frame_ms"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.upper(F.hex(F.col("frame"))).alias("frame_hex"),
    )


SQL_VIDEO_AUDIT = """
WITH d AS (
  SELECT doc_id, CAST(3 + doc_id % 3 AS BIGINT) AS nfr,
         (3 + doc_id % 3) * 12 + doc_id % 2 AS nb
  FROM documents
),
hx AS (
  SELECT doc_id, nfr,
         list_aggregate(list_transform(generate_series(0, CAST(nb - 1 AS BIGINT)),
           j -> lpad(hex((doc_id * 7 + (j // 12) * 13 + (j % 12) * 5) % 251),
                     2, '0')), 'string_agg', '') AS h
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(fi AS BIGINT) AS frame_idx,
       CAST(fi * 1000 // 10 AS BIGINT) AS frame_ms,
       nfr AS n_frames,
       upper(substring(h, CAST(fi * 24 + 1 AS INT), 24)) AS frame_hex
FROM hx, UNNEST(generate_series(0, nfr - 1, 2)) AS t(fi)
"""


STAGED_QUERIES = {
    "diversity_sample": q_diversity_sample,
    "audio_audit": q_audio_audit,
    "sketchfam_audit": q_sketchfam_audit,
    "video_audit": q_video_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "diversity_sample": _sql_diversity_sample(),
        "audio_audit": SQL_AUDIO_AUDIT,
        "sketchfam_audit": _sql_sketchfam_audit(),
        "video_audit": SQL_VIDEO_AUDIT,
    }


# names each staged consolidation row replaces at registration time
STAGED_REPLACES: dict[str, tuple[str, str]] = {
    "sketchfam_audit": ("sketch_audit", "hist_quantiles"),
}
