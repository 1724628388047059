"""Scalar/column expression helpers (SURVEY §2.2).

Each helper names a pattern the reference applies repeatedly; the Spark
form is a pure Column expression so Catalyst folds it into whole-stage
codegen (no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def coalesce_cols(*cols: str | Column) -> Column:
    """First non-null among sibling columns (P7).

    The reference coalesces survey-variant columns (landing-site
    variants, species_* variants): R/preprocessing-surveys.R:93-97,
    R/survey-reshaping.R:528-533.
    """
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


first_non_null = coalesce_cols


def recode(col: str | Column, mapping: Mapping[str, str], default: Column | None = None) -> Column:
    """Chained when/otherwise code→label recode (P8).

    Mirrors the reference's big ``case_when`` maps (habitat codes,
    length-class midpoints): R/preprocessing-surveys.R:200-213,309-319.
    For large maps this stays a single CASE expression — constant-folded
    by Catalyst, no join or UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return default if default is not None else c
    return expr.otherwise(default if default is not None else c)


def row_sum(*cols: str | Column) -> Column:
    """NA-skipping horizontal sum (P12): ``rowSums(across(...), na.rm=TRUE)``.

    R/preprocessing-surveys.R:174-177 sums men/women/child fisher counts
    treating NA as 0.  Expressed as coalesce-to-zero addition so it stays
    a codegen'd arithmetic expression.
    """
    out: Column | None = None
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        term = F.coalesce(col, F.lit(0.0))
        out = term if out is None else out + term
    assert out is not None, "row_sum needs at least one column"
    return out


def safe_div(num: Column, den: Column) -> Column:
    """Division normalizing R's ``x/0 = Inf`` to NULL (§1.2 Inf handling).

    The reference computes CPUE/RPUE then scrubs infinities
    (R/validation.R:369-374, R/export.R:560-566); here the scrub is
    fused into the division.
    """
    return F.when((den.isNull()) | (den == 0), F.lit(None)).otherwise(num / den)


def flag_concat(*cols: str | Column, sep: str = ", ") -> Column:
    """Null-skipping multi-column flag concatenation (A9).

    The reference builds an alert string from 9 nullable flag columns
    then regex-scrubs literal "NA" tokens (R/validation.R:211-234);
    ``concat_ws`` skips NULLs natively so no scrub is needed.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.concat_ws(sep, *cs)
    # concat_ws of all-NULL yields '' — normalize to NULL like the reference's NA
    return F.when(out == "", F.lit(None)).otherwise(out)


def strip_suffix_underscores(col: str | Column) -> Column:
    """Clean numeric strings like ``"3_"`` → ``3.0`` before casting.

    R/preprocessing-surveys.R:160-163 strips trailing underscores from
    fisher-count answers.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"_+$", "").cast("double")


def non_null_any(cols: Iterable[str | Column]) -> Column:
    """True when at least one of ``cols`` is non-null (P6 complement).

    Used to drop rows whose whole repeat-group is empty
    (R/preprocessing-surveys.R:489-494, R/survey-reshaping.R:72-78).
    """
    out: Column | None = None
    for c in cols:
        col = (F.col(c) if isinstance(c, str) else c).isNotNull()
        out = col if out is None else (out | col)
    assert out is not None
    return out
