"""Date/time expression helpers (SURVEY §2.9)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_floor(col: str | Column) -> Column:
    """Truncate to month (D2): R ``floor_date(x, 'month')``
    (R/export.R:171,216,252,283).  Returns DATE for stable cross-engine
    comparison."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c).cast("date")


def duration_hours(start: str | Column, end: str | Column) -> Column:
    """Timestamp difference in fractional hours (D3): R
    ``difftime(units='hours')`` (R/preprocessing-surveys.R:1192-1196)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return (F.unix_timestamp(e) - F.unix_timestamp(s)) / F.lit(3600.0)


def month_spine(min_date: Column, max_date: Column) -> Column:
    """Array of month starts covering [min, max] (D4): R
    ``seq(min, max, by='month')`` inside ``tidyr::complete``
    (R/export.R:191,234,267,313)."""
    return F.sequence(
        F.date_trunc("month", min_date).cast("date"),
        F.date_trunc("month", max_date).cast("date"),
        F.expr("interval 1 month"),
    )


def to_iso_string(col: str | Column) -> Column:
    """Format timestamp to ISO-8601 Z string (D6): R/export.R:334."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def version_stamp(prefix: str, git_sha: str = "local") -> str:
    """Versioned artifact name ``prefix__{ts}_{sha}__`` (D7):
    R/utils.R:30-52.  Driver-side (not a Column) — used by io.parquet_io."""
    ts = datetime.utcnow().strftime("%Y%m%d%H%M%S")
    return f"{prefix}__{ts}_{git_sha}__"
