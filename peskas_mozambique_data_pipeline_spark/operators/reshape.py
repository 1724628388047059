"""Reshaping operators — pivot/unpivot/explode/densify (SURVEY §2.8).

These are the reference's signature moves (repeat-group melt, length-
frequency expansion, calendar completion).  All are set-based single
passes; the reference's per-row ``rowwise()/group_split()`` loops
(R/survey-reshaping.R:538-542) are deliberately NOT reproduced.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    name_col: str = "metric_type",
    value_col: str = "metric_value",
) -> DataFrame:
    """Wide→long melt (R1/R8): ``tidyr::pivot_longer``
    (R/preprocessing-surveys.R:524-535,795-804).

    Uses the native ``unpivot`` (Spark 3.4+) which compiles to a single
    Expand node — one pass, no join, no shuffle.
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        name_col,
        value_col,
    )


def pivot_wider(
    df: DataFrame,
    keys: Sequence[str],
    name_col: str,
    value_col: str,
    names: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long→wide pivot (R2): ``tidyr::pivot_wider``
    (R/preprocessing-surveys.R:536, R/export.R:373-381).

    Passing ``names`` explicitly avoids the extra distinct-collect job
    Spark otherwise runs to discover pivot values — important at scale.
    """
    agg_fn = getattr(F, agg)
    gb = df.groupBy(*keys)
    p = gb.pivot(name_col, list(names)) if names is not None else gb.pivot(name_col)
    return p.agg(agg_fn(F.col(value_col)))


def explode_repeat_group(
    df: DataFrame,
    array_col: str,
    pos_col: str = "n_catch",
    keep: Sequence[str] | None = None,
) -> DataFrame:
    """Positional repeat-group reshape (R3).

    The reference receives Kobo repeat groups as mangled column families
    ``species_group.0.*`` and melts them by parsing indices out of the
    names (R/survey-reshaping.R:25-86).  Spark-first we keep the group
    as ``ArrayType(StructType)`` and ``posexplode`` — generator node, no
    name parsing, no shuffle.  Position is 1-based like the reference's
    ``n_catch``.
    """
    keep_cols = [F.col(c) for c in (keep or df.columns) if c != array_col]
    exploded = df.select(*keep_cols, F.posexplode_outer(F.col(array_col)).alias("_pos", "_grp"))
    return exploded.select(*keep_cols, (F.col("_pos") + 1).alias(pos_col), F.col("_grp.*"))


def stack_length_bins(
    df: DataFrame,
    id_cols: Sequence[str],
    bin_cols: Sequence[str],
    prefix: str = "no_individuals_",
    range_col: str = "length_range",
    count_col: str = "count",
    drop_zero: bool = True,
) -> DataFrame:
    """Length-frequency expansion (R4): per species row, pivot
    ``no_individuals_<a>_<b>`` count columns into (length_range, count)
    rows and drop empty bins (R/survey-reshaping.R:182-239).

    The reference drops both NULL and ``"0"`` bins
    (R/preprocessing-surveys.R:572) — ``drop_zero`` mirrors that, so
    zero-count bins don't survive as catch rows with catch_kg = 0.

    One ``stack()`` Expand — replaces the reference's per-row
    ``group_split |> map_dfr`` loop with a set-based plan.
    """
    pairs = []
    for c in bin_cols:
        label = c[len(prefix):] if c.startswith(prefix) else c
        pairs.append((label, c))
    stack_expr = "stack({n}, {args}) as ({rc}, {cc})".format(
        n=len(pairs),
        args=", ".join(f"'{label}', `{col}`" for label, col in pairs),
        rc=range_col,
        cc=count_col,
    )
    out = df.select(*[F.col(c) for c in id_cols], F.expr(stack_expr))
    out = out.filter(F.col(count_col).isNotNull())
    if drop_zero:
        # parseable zeros drop; unparseable non-null strings pass through
        out = out.filter(F.coalesce(F.col(count_col).cast("double") != 0, F.lit(True)))
    return out


def explode_delimited(
    df: DataFrame, col: str, out_col: str | None = None, sep: str = r",\s*"
) -> DataFrame:
    """Delimited string → rows (R6): ``tidyr::separate_rows``
    (R/validation.R:1136-1139,1291-1294)."""
    out_col = out_col or col
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.split(F.col(col), sep)).alias(out_col))


def complete_months(
    df: DataFrame,
    dim_cols: Sequence[str],
    date_col: str,
    fill: dict[str, Column] | None = None,
    facts_preaggregated: bool = True,
) -> DataFrame:
    """Calendar densification (R7): ``tidyr::complete(dims, date=seq(min,max,'month'))``
    (R/export.R:189-198,232-243,265-273,311-323).

    Builds a month spine bounded by the observed [min, max] month, cross
    joins it with the distinct dimension combinations, and left-joins the
    facts back, emitting NULL metric rows for missing months.

    Scale notes: the spine is one row exploded from a global min/max
    aggregate (tiny); ``dims`` distinct is bounded by real-world
    cardinality (sites × gears).  Both sides of the cross join are
    broadcast; the final left join shuffles only if the fact side does.
    ``df`` is consumed THREE times (spine bounds, dims, join) — with
    ``facts_preaggregated=True`` it is localCheckpointed here (a tiny
    frame with a corpus-sized producer, exactly the SCALE.md
    multi-consumer rule), so the fact table behind the aggregate is
    scanned ONCE instead of once per consumer.

    ``facts_preaggregated`` declares the contract that ``df`` has one
    row per (dims, month) — the densification input shape — which
    bounds it by |dims| x |spine| and makes it safe to broadcast for a
    map-side join AND cheap to materialize.  Pass ``False`` for a raw
    fact frame whose cardinality the spine does not bound: no
    checkpoint (materializing a corpus-sized frame is the caller's
    call), no broadcast hint — AQE broadcasts only if the runtime size
    actually fits.
    """
    if facts_preaggregated:
        df = df.localCheckpoint()
    spine = (
        df.select(F.min(date_col).alias("mn"), F.max(date_col).alias("mx"))
        .select(
            F.explode(
                F.sequence(
                    F.date_trunc("month", F.col("mn")).cast("date"),
                    F.date_trunc("month", F.col("mx")).cast("date"),
                    F.expr("interval 1 month"),
                )
            ).alias(date_col)
        )
    )
    dims = df.select(*dim_cols).distinct()
    scaffold = F.broadcast(dims).crossJoin(F.broadcast(spine))
    facts = F.broadcast(df) if facts_preaggregated else df
    out = scaffold.join(facts, [*dim_cols, date_col], "left")
    if fill:
        for c, v in fill.items():
            out = out.withColumn(c, F.coalesce(F.col(c), v))
    return out


def rename_by_regex(df: DataFrame, pattern: str, replacement: str = "") -> DataFrame:
    """Bulk column rename (P3): ``rename_with(~str_remove(., 'group_general/'))``
    (R/preprocessing-surveys.R:78,140,1130-1135).  Plan-build-time only."""
    import re

    return df.toDF(*[re.sub(pattern, replacement, c) for c in df.columns])


def select_by_pattern(df: DataFrame, *, starts: str | None = None, contains: str | None = None,
                      ends: str | None = None, keep: Iterable[str] = ()) -> DataFrame:
    """Pattern-based projection (P2): tidyselect ``starts_with`` etc.
    (R/preprocessing-surveys.R:1136-1166)."""
    cols = [
        c
        for c in df.columns
        if (starts and c.startswith(starts))
        or (contains and contains in c)
        or (ends and c.endswith(ends))
    ]
    return df.select(*list(keep), *cols)
