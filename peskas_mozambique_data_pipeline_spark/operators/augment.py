"""Deterministic training-data augmentation transforms.

The last mile of a pre-training pipeline rewrites a fraction of
documents into task formats the model should learn: fill-in-the-middle
(Bavarian et al. 2022, "Efficient Training of Language Models to Fill
in the Middle") and T5-style span corruption (Raffel et al. 2020).
Both are implemented here as PURE COLUMN EXPRESSIONS over the token
array — scan-shaped (zero shuffle, zero UDF), so augmenting 100 TB
costs one pass — and fully DETERMINISTIC: every random choice (is this
doc transformed? where are the cut points?) derives from
``md5(salt, doc_id)`` uniforms, so re-runs, retries, and any
partitioning produce byte-identical output, and an epoch re-salt draws
a fresh augmentation pattern (the ``deterministic_shuffle`` epoch
discipline applied to augmentation).

Cut points are computed with exact integer arithmetic on the uniform's
32-bit numerator (``u32 % span``, never a float multiply) so the
boundary can't drift between engines — the registry's reproducibility
posture, and what keeps a python twin bit-exact (pytest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# PSM sentinel format (prefix-suffix-middle, the canonical FIM layout):
FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"
SPAN_SENTINEL = "<|extra_id_{i}|>"


def _u32(id_col: Column, salt: str) -> Column:
    """The 32-bit integer numerator of a deterministic uniform — exact
    modular arithmetic beats a float multiply at span boundaries."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.lit(salt), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


def fim_transform(
    df: DataFrame,
    rate: float = 0.5,
    salt: str = "fim0",
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
    min_tokens: int = 8,
) -> DataFrame:
    """Fill-in-the-middle rewrite (PSM): for an md5-selected ``rate``
    fraction of documents, pick two deterministic token cut points
    a < b and emit ``<pre> prefix <suf> suffix <mid> middle`` — the
    model learns to produce the middle given both sides.  Untouched
    docs pass through (the FIM paper's joint objective: a rate-mix of
    transformed and plain text).

    Cut points: with n usable tokens, a = u1 % (n−1) + 1 and
    b = a + u2 % (n−a) + 1 − ranges chosen so prefix, middle and
    suffix are all non-empty.  Docs under ``min_tokens`` pass through
    untransformed (degenerate splits teach nothing).  Adds
    ``fim_applied``.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    out_col = out_col or text_col
    toks = tokens(text_col)
    n = F.size(toks)
    pick = (_u32(F.col(id_col), salt + "_pick") % 1_000_000_000)  # noqa: E501  (1e9 grid — exact)
    selected = (pick < F.lit(int(round(rate * 1_000_000_000)))) & (
        n >= F.lit(min_tokens)
    )
    a = (_u32(F.col(id_col), salt + "_a") % (n - 1)) + 1
    b = a + (_u32(F.col(id_col), salt + "_b") % (n - a)) + 1
    prefix = F.array_join(F.slice(toks, 1, a), " ")
    middle = F.array_join(F.slice(toks, a + 1, b - a), " ")
    # b ∈ [a+1, n]: prefix and middle are always non-empty; the suffix
    # is empty exactly when b == n (legal PSM — the middle runs to EOF)
    suffix = F.array_join(F.slice(toks, b + 1, n - b), " ")
    fim = F.concat(
        F.lit(FIM_PRE), prefix, F.lit(" " + FIM_SUF + " "), suffix,
        F.lit(" " + FIM_MID + " "), middle,
    )
    return df.withColumn(
        out_col, F.when(selected, fim).otherwise(F.col(text_col))
    ).withColumn("fim_applied", selected)


def span_corrupt(
    df: DataFrame,
    n_spans: int = 2,
    span_len: int = 3,
    salt: str = "t5_0",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
) -> DataFrame:
    """T5-style span corruption: replace ``n_spans`` deterministic
    non-overlapping ``span_len``-token spans with sentinel tokens and
    emit the (inputs, targets) pair — inputs carry the sentinels,
    targets carry sentinel-prefixed removed spans.

    Span starts land in disjoint document segments (segment i of
    ``n_spans`` equal slices), which guarantees non-overlap without a
    rejection loop — a deterministic, closed-form placement.  Docs
    under ``min_tokens`` or too short for the layout pass through with
    NULL targets.  Adds ``corrupt_applied``.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    seg = F.floor(n / F.lit(n_spans)).cast("int")
    ok = (n >= F.lit(max(min_tokens, n_spans * (span_len + 1)))) & (
        seg > F.lit(span_len)
    )

    inputs = None
    targets = None
    prev_end = F.lit(0)
    for i in range(n_spans):
        # span start inside segment i, leaving span_len room
        room = seg - F.lit(span_len)
        start = F.lit(i) * seg + (_u32(F.col(id_col), f"{salt}_s{i}") % room)
        sent = F.lit(SPAN_SENTINEL.format(i=i))
        keep = F.array_join(
            F.slice(toks, prev_end + 1, start - prev_end), " "
        )
        removed = F.array_join(F.slice(toks, start + 1, span_len), " ")
        piece = F.concat(keep, F.lit(" "), sent)
        inputs = piece if inputs is None else F.concat(inputs, F.lit(" "), piece)
        tpiece = F.concat(sent, F.lit(" "), removed)
        targets = tpiece if targets is None else F.concat(targets, F.lit(" "), tpiece)
        prev_end = start + F.lit(span_len)
    tail = F.array_join(F.slice(toks, prev_end + 1, n - prev_end), " ")
    inputs = F.concat(inputs, F.lit(" "), tail)

    return (
        df.withColumn("inputs", F.when(ok, inputs).otherwise(F.col(text_col)))
        .withColumn("targets", F.when(ok, targets))
        .withColumn("corrupt_applied", ok)
    )
