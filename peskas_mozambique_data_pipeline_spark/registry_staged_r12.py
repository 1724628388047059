"""Round-12 STAGED registry rows — the NOTES pre-staging recipe
applied one round further out, so r12 registration starts from
bit-exact two-scale-factor evidence just like r10's and r11's swaps
did (``tests/test_registry_staged_r12.py``).

Window/ceiling arithmetic: the r11 recipe lands the registry at 98
with 2 slots of headroom under the 100 ceiling, so r12 can register
up to two NEW rows before another consolidation is required — the two
rows below use exactly that headroom.  (If r12 wants additional rows,
natural next consolidations in the r11-rotating tail exist: e.g.
``sketch_audit`` + ``hist_quantiles``, both register-sketch rows.)

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


STAGED_QUERIES = {
    "diversity_sample": q_diversity_sample,
    "audio_audit": q_audio_audit,
}


def build_staged_oracle_sql() -> dict[str, str]:
    return {
        "diversity_sample": _sql_diversity_sample(),
        "audio_audit": SQL_AUDIO_AUDIT,
    }


# names each staged consolidation row replaces at registration time
# (none yet — r12 has 2 slots of post-r11 headroom for new rows)
STAGED_REPLACES: dict[str, tuple[str, str]] = {}
