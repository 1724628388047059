"""Stream-stream joins with watermark-bounded state.

The streaming tiers so far join STREAM × STATIC (curate's broadcast
gates) or STREAM × ZONE (the persistent dedup/ANN indexes, where the
"other side" is compacted parquet).  A genuine stream-STREAM join —
correlate two live feeds, e.g. fetch requests with their responses, or
trip-start pings with landing reports — is a different state problem:
each side must buffer rows until the other side's matching row can no
longer arrive, and WITHOUT a bound that buffer is the whole stream.

``stream_stream_interval_join`` expresses the bounded form Spark's
engine supports natively: equi-keys plus an EVENT-TIME interval
(``right_ts`` within [left_ts, left_ts + max_delay]), with watermarks
on both sides.  The watermark + interval give the engine a provable
eviction rule — left rows age out once the right watermark passes
``left_ts + max_delay``, right rows once the left watermark passes
``right_ts`` — so state is bounded by (delay + watermark) × arrival
rate, never stream length (the Spark micro-batch join-state design;
see SPARK-24441).  Inner joins emit as matches arrive; outer-side
NULL rows emit only after the watermark CLOSES the interval, so an
``availableNow`` drain of a finite fixture may legitimately hold back
trailing outer rows — batch-replay tests should assert on the inner
matches (ours does).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on equi-keys within an event-time
    interval: ``right_ts ∈ [left_ts, left_ts + max_delay]``.

    Column contract: ``left_ts`` / ``right_ts`` must be DISTINCT names
    (rename upstream — the joined frame keeps both), and non-key
    column names must not collide.  Both sides get ``watermark``;
    state eviction follows from watermark + interval (module
    docstring).  ``how`` follows Spark's stream-stream support matrix
    (inner; left/right/full outer with the same watermark+interval
    requirements); this wrapper supports ``inner`` and ``left_outer``
    — it keeps the LEFT key columns and drops the right duplicates,
    which is only total for those two (a right/full outer would need
    key coalescing; extend deliberately rather than silently)."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    if how not in ("inner", "left_outer", "leftouter", "left"):
        raise ValueError(
            "stream_stream_interval_join supports inner/left_outer; "
            "right/full outer need key coalescing"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    keys = [lw[k] == rw[k] for k in key_cols]
    window = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts)
        <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
    )
    cond = reduce(lambda a, b: a & b, keys + [window])
    joined = lw.join(rw, cond, how)
    # drop the right side's duplicated key columns (values equal by
    # the equi-condition; NULL-extended rows keep the left copy)
    for k in key_cols:
        joined = joined.drop(rw[k])
    return joined
