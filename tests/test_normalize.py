"""Text normalization: codepoint-pinned fixtures for the whitespace
expression and the unicode pandas UDF, plus the dedup-unification
property the pass exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import text as text_ops
from peskas_mozambique_data_pipeline_spark.operators.dedup import exact_dup_groups


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], ["t"]).select(expr.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "raw,want",
    [
        ("a\r\nb\tc", "a b c"),
        ("  lots   of    space  ", "lots of space"),
        ("ctrl\x00\x01here", "ctrl here"),
        ("nbsp and em-space　wide", "nbsp and em-space wide"),
        ("​zero-width", "zero-width"),
        ("", ""),
    ],
)
def test_normalize_whitespace(spark, raw, want):
    got = _one(spark, raw, text_ops.normalize_whitespace_expr("t"))
    assert got == want


def test_normalize_unicode_nfkc(spark):
    rows = [
        (1, "café"),        # combining acute -> composed é
        (2, "ＡＢＣ"),  # fullwidth ABC -> ASCII
        (3, "ﬁle"),          # fi ligature -> "fi" under NFKC
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text"]
        for r in text_ops.normalize_unicode(df, form="NFKC").collect()
    }
    assert out[1] == "café"
    assert out[2] == "ABC"
    assert out[3] == "file"
    assert out[4] is None


def test_normalize_unicode_nfc_keeps_compat_chars(spark):
    df = spark.createDataFrame([(1, "ﬁle")], ["doc_id", "text"])
    out = text_ops.normalize_unicode(df, form="NFC").first()["text"]
    assert out == "ﬁle"  # NFC does not decompose compatibility forms


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        text_ops.normalize_unicode(df, form="NFX")


def test_normalization_unifies_formatting_variants_for_dedup(spark):
    # same content, different encodings/formatting: invisible to exact
    # dedup until normalized, one group after
    rows = [
        (1, "café menu\r\nitems"),
        (2, "café   menu\titems"),
        (3, "different text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    before = exact_dup_groups(df)
    assert before.count() == 0
    normed = text_ops.normalize_unicode(df, form="NFC").withColumn(
        "text", text_ops.normalize_whitespace_expr("text")
    )
    groups = exact_dup_groups(normed).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]
