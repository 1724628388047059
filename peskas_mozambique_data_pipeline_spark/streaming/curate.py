"""Streaming corpus curation: the stream-safe subset of the batch DAG
(``plans/corpus.py``) composed as ONE continuous query, so documents
landing incrementally get the same front-door treatment the batch
pipeline gives a backfill.

Composition order mirrors the batch DAG and puts every STATELESS gate
before the stateful ones, so bounded dedup state only ever holds
documents that already survived the cheap filters:

    (HTML → text extraction) → robots filter → quality gate →
    classifier gate → bloom decontamination → URL refetch dedup →
    content digest dedup

Stream-safety notes per stage:

* robots / quality / classifier / bloom — pure column expressions or
  stream-static broadcast joins: stateless, scan-bound, no watermark.
* URL dedup / content dedup — ``dropDuplicatesWithinWatermark``:
  first-seen-wins within the horizon, state bounded by the watermark
  (the batch winner-per-key aggregate is illegal in an append stream).
* Stages the batch DAG runs that CANNOT stream (near-dup clustering,
  semantic dedup, global shuffle/shard/sequence exports) stay batch
  jobs over the curated zone — the standard lambda split; content
  ids are content-addressed, so the batch passes converge regardless
  of which path a document arrived by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import classifier as clf_ops
from ..operators import text as text_ops
from ..operators import web as web_ops
from .ingest import stream_bloom_decontaminate


def stream_curate(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    quality: bool = True,
    quality_kw: dict | None = None,
    classifier_weights: dict[int, int] | None = None,
    classifier_bias: int = 0,
    classifier_threshold: float = 0.0,
    classifier_dim: int = 2**18,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    url_col: str | None = None,
    robots_rules: DataFrame | None = None,
    content_dedup: bool = True,
    extract_html: bool = False,
) -> DataFrame:
    """Compose the enabled stages over a streaming documents frame and
    return the curated stream (write it with ``ingest.write_zone`` or
    feed the index sinks).  Every knob mirrors its batch-DAG twin, and
    each stage reuses the batch operator's exact expressions, so a
    document admitted by the stream is a document the batch DAG would
    have admitted (stage-for-stage parity is pytest-pinned).
    """
    out = stream
    if extract_html:
        # HTML → text is a pure regexp scan (operators/html) — fully
        # stateless, so it streams unchanged and runs FIRST: every
        # later gate must see rendered text, not markup
        from ..operators import html as html_ops

        out = html_ops.extract_html_text(out, html_col=text_col, out_col=text_col)
    if robots_rules is not None:
        if url_col is None:
            raise ValueError("robots_rules requires url_col")
        out = web_ops.filter_robots_disallowed(out, robots_rules, url_col)
    if quality:
        out = out.filter(text_ops.c4_keep_expr(text_col, **(quality_kw or {})))
    if classifier_weights is not None:
        out = clf_ops.score_hashed_linear_map(
            out, classifier_weights, text_col=text_col,
            dim=classifier_dim, bias_nano=classifier_bias,
        ).filter(F.col("score") > classifier_threshold)
    if benchmark is not None:
        out = stream_bloom_decontaminate(
            out, benchmark, text_col=text_col, id_col=id_col, n=decontam_n
        )
    # ONE watermark ahead of both stateful stages — chaining the
    # standalone twins would re-declare it, which streaming disallows
    # ("Redefining watermark"); the dedup expressions below are the
    # twins' exact key functions
    if url_col is not None or content_dedup:
        out = out.withWatermark(ts_col, watermark)
    if url_col is not None:
        out = out.withColumn(
            "canonical_url", web_ops.canonical_url(url_col)
        ).dropDuplicatesWithinWatermark(["canonical_url"])
    if content_dedup:
        out = (
            out.withColumn("_digest", F.sha2(F.col(text_col), 256))
            .dropDuplicatesWithinWatermark(["_digest"])
            .drop("_digest")
        )
    return out
