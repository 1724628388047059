"""Multi-dimensional data layout: Z-order (Morton) clustering keys,
range-clustered writes, and the per-file skipping index they enable.

Why this exists at 100 TB: a table laid out by ONE sort key prunes
scans only on that key's predicates.  Interleaving the bits of several
keys' bucket indexes (Morton 1966) gives a single clustering key whose
ranges are small HYPERCUBES of the key space, so per-file min/max
stats stay tight on EVERY interleaved dimension at once — the engine
skips files for predicates on any of them (the OPTIMIZE ZORDER BY of
Delta/Iceberg, re-expressed as plain DataFrame ops + a range
repartition).  The layout is advisory: it changes where rows sit,
never what they are.

Engine-exactness: bucket indexes are BIGINT affine bins over the exact
global min/max (two-pass; the stats agg is one tiny broadcastable
row) computed with INTEGER division (``DIV`` — never ``/``, which is
double division on both engines and loses exactness past 2^53), and
the interleave is shift/mask integer arithmetic — a foreign engine
replays every key bit-for-bit, so the operator sits in the hard-oracle
class despite existing purely for physical layout.

Reference parity note: the reference pipeline (R, dplyr) has no
layout-optimization surface at all — exports are written as-is
(`R/export.R`); this family is part of the repo's 100 TB extension
surface alongside the dedup/sketch/ANN tiers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Add the Morton interleave key of ``cols`` as ``out_col``.

    Two passes: one global min/max aggregate over the keyed columns
    (a single row, broadcast back — the 1-row stats-join pattern, no
    driver collect), then a per-row map-side expression: bucket each
    column into 2^bits bins — ``(v - lo) * 2^bits DIV (hi - lo + 1)``,
    exact BIGINT arithmetic, monotone, total (hi == lo degenerates to
    bucket 0) — and interleave bucket bits round-robin (bit j of
    column c lands at key bit j*d + c).  The key fits a BIGINT for
    d * bits <= 62.  Columns must be integral (cast dates/timestamps
    to epoch units upstream).

    Null keyed values bucket to 0: rows missing a dimension cluster
    at the low corner instead of scattering (documented,
    deterministic).
    """
    d = len(cols)
    if d < 1:
        raise ValueError("zorder_key needs at least one column")
    if d * bits > 62:
        raise ValueError(f"{d} cols * {bits} bits exceeds a BIGINT key")
    stats = df.agg(
        *[
            s
            for c in cols
            for s in (
                F.min(F.col(c).cast("long")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("long")).alias(f"_hi_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(stats))
    bcols = []
    for ci, c in enumerate(cols):
        # the affine bin runs in DECIMAL(38,0): (v − lo) · 2^bits in
        # BIGINT wraps silently (non-ANSI) once the column span exceeds
        # 2^(63−bits) — e.g. nanosecond epoch timestamps — corrupting
        # the clustering key.  Worst case (span 2^64 − 1) · 2^62 < 10^38
        # fits exactly; DIV on decimals is still integer division and
        # returns BIGINT, so in-range spans produce bit-identical
        # buckets to the old BIGINT path.
        num = (
            F.col(c).cast("decimal(20,0)") - F.col(f"_lo_{c}")
        ) * F.lit(1 << bits).cast("decimal(19,0)")
        out = out.withColumn(f"_num_{ci}", num)
        out = out.withColumn(
            f"_b_{ci}",
            F.coalesce(
                F.expr(
                    f"_num_{ci} DIV "
                    f"(CAST(_hi_{c} AS DECIMAL(20,0)) - _lo_{c} + 1)"
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
        bcols.append(f"_b_{ci}")
    key = F.lit(0).cast("long")
    for ci in range(d):
        b = F.col(bcols[ci])
        # spread bit j of this column's bucket to key bit j*d + ci
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1).cast("long"))
            key = key + F.shiftleft(bit, j * d + ci)
    drop = (
        [f"_lo_{c}" for c in cols]
        + [f"_hi_{c}" for c in cols]
        + [f"_num_{ci}" for ci in range(d)]
        + bcols
    )
    return out.withColumn(out_col, key).drop(*drop)


def zorder_index(
    keyed: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    bucket_bits: int = 6,
    key_col: str = "zkey",
) -> DataFrame:
    """The skipping index a Z-ordered layout earns: split the key
    space into ``2^bucket_bits`` fixed-width key ranges (stand-ins for
    files) and record each range's row count and per-dimension min/max
    — exactly the footer stats an engine consults to prune.  Tight
    per-dimension spans across MANY dimensions at once is the measure
    that the interleave worked (a 1-D sort gives tight spans only on
    its own key).

    Fixed-width power-of-two ranges (``key >> shift``) rather than
    equal-frequency ones so the index is a pure deterministic
    aggregate — no sampled range exchange, exact shifts only — and
    replayable by the oracle."""
    d = len(cols)
    shift = max(0, d * bits - bucket_bits)
    bucket = F.shiftright(F.col(key_col), shift)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"max_{c}"))
    return keyed.groupBy(bucket.alias("bucket")).agg(*aggs)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int | None = None,
    key_col: str = "zkey",
) -> None:
    """Write ``df`` Z-order-clustered: key, range-repartition on the
    key (equal-frequency file cuts via Spark's sampled range exchange
    — fine here: the key VALUES are deterministic and layout is
    advisory), sort within partitions, drop the key, write parquet.

    The sampled boundaries make file membership run-dependent but
    never row content; readers see identical data with min/max footers
    clustered on every interleaved dimension."""
    keyed = zorder_key(df, cols, bits=bits, out_col=key_col)
    parted = (
        keyed.repartitionByRange(n_files, key_col)
        if n_files
        else keyed.repartitionByRange(key_col)
    )
    parted.sortWithinPartitions(key_col).drop(key_col).write.mode(
        "overwrite"
    ).parquet(path)
