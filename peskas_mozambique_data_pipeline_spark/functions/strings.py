"""String expression helpers (SURVEY §2.2 P11, §2.10 F1)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_name(col: str | Column) -> Column:
    """Fuzzy-match name normalization (F1).

    Mirrors R/preprocessing-surveys.R:1293-1313: strip non-alphabetic
    characters, squish whitespace, lowercase; single-token names become
    'undefined'; finally remove internal spaces so variants compare as
    one token.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.lower(F.trim(F.regexp_replace(c, r"[^A-Za-z ]", " ")))
    squished = F.regexp_replace(cleaned, r"\s+", " ")
    single_token = F.size(F.split(squished, " ")) <= 1
    return F.when(squished.isNull() | (squished == ""), F.lit(None)).otherwise(
        F.when(single_token, F.lit("undefined")).otherwise(F.regexp_replace(squished, " ", ""))
    )


def title_case_clean(col: str | Column) -> Column:
    """lowercase/underscore coded value → Title Case label, e.g.
    'mocimboa_da_praia' → 'Mocimboa Da Praia'
    (R/preprocessing-surveys.R:108 str_to_title after str_replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.regexp_replace(c, "_", " "))
