"""Column-level helper functions (pure expressions, JVM-side).

Everything here returns/operates on ``pyspark.sql.Column`` so the whole
pipeline stays inside Catalyst + whole-stage codegen; no Python UDFs.
"""

from .columns import (
    coalesce_cols,
    first_non_null,
    flag_concat,
    recode,
    row_sum,
    safe_div,
    strip_suffix_underscores,
)
from .dates import (
    duration_hours,
    month_floor,
    month_spine,
    to_iso_string,
    version_stamp,
)
from .strings import normalize_name, title_case_clean

__all__ = [
    "coalesce_cols",
    "first_non_null",
    "flag_concat",
    "recode",
    "row_sum",
    "safe_div",
    "strip_suffix_underscores",
    "duration_hours",
    "month_floor",
    "month_spine",
    "to_iso_string",
    "version_stamp",
    "normalize_name",
    "title_case_clean",
]
