"""Text-analysis operators for large-scale training-data pipelines.

Everything is pure Spark SQL expressions over a string column — no
Python UDFs — so a 100 TB corpus scans at parquet-reader speed with
whole-stage codegen.  The fisheries reference's seed for this family is
its name-normalization pipeline (R/preprocessing-surveys.R:1293-1313);
these operators generalize it to document corpora.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# small per-language stopword marker sets for the n-gram/stopword-voting
# language heuristic (deterministic, SQL-expressible)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "von"),
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: str | Column) -> Column:
    """BPE-ish sub-word segmentation: split into letter runs, digit runs
    and single punctuation marks (a regex approximation of byte-pair
    pretokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    spaced = F.regexp_replace(c, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", r" $1 ")
    return F.split(F.trim(spaced), r"\s+")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring features: token count, mean token
    length, punctuation ratio, stopword ratio, and a composite score.

    All features are single-pass column expressions; the corpus never
    shuffles.
    """
    t = tokens(text_col)
    c = F.col(text_col)
    n_tok = F.size(t)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tok
    # heuristic composite: long-enough docs with natural stopword density
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + stop_ratio * F.lit(2.0)
        - punct_ratio
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_pred_expr(text: str | Column) -> Column:
    """Predicted language of ONE string column — the marker-word argmax
    :func:`language_id` applies per document, packaged as a reusable
    expression so per-LINE passes (:func:`segment_languages`) share the
    identical scorer.  ``"und"`` when no marker hits."""
    c = F.col(text) if isinstance(text, str) else text
    langs = sorted(LANG_MARKERS)

    # Let-binding via single-element transform (r14): a lambda VARIABLE
    # is evaluated once and referenced cheaply, whereas a plain
    # sub-EXPRESSION is re-evaluated at every reference site (HOFs are
    # interpreted — codegen subexpression elimination never sees them).
    # The old form referenced ``tokens(c)`` once per language filter —
    # four tokenizations per line — and the score expressions once per
    # comparison.  Here the token array binds once (outer transform)
    # and the 4-score array binds once (inner transform); the marker
    # membership tests and the argmax are unchanged, so scores and
    # prediction are identical.
    def _scores(t: Column) -> Column:
        return F.array(
            *[
                F.size(
                    F.filter(
                        t, (lambda m: lambda x: x.isin(*m))(LANG_MARKERS[lang])
                    )
                )
                for lang in langs
            ]
        )

    def _pred(sv: Column) -> Column:
        scores = {lang: F.get(sv, i) for i, lang in enumerate(langs)}
        best = F.greatest(*scores.values())
        pred = F.lit(None)
        for lang in reversed(langs):
            pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
        return F.when(best > 0, pred).otherwise(F.lit("und"))

    scored = F.transform(F.array(tokens(c)), _scores)
    return F.get(F.transform(scored, _pred), 0)


def segment_languages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scrub: bool = False,
) -> DataFrame:
    """Per-LINE language segmentation (the CCNet-style pass): documents
    that are mostly one language but carry embedded chrome/quotes in
    another get a majority language, the share of lines agreeing with
    it, and — with ``scrub=True`` — a rebuilt text keeping only
    majority-language lines (``und`` lines are neutral: they never
    vote and always survive a scrub — blank lines and code are not
    "foreign").

    Shape (the ``scrub_boilerplate_lines`` discipline): posexplode
    lines → per-line :func:`lang_pred_expr` (pure expressions) → one
    (doc, lang) count groupBy → ``max_by`` majority per doc → join
    back on the id key → ordered rebuild.  Three id-keyed shuffles,
    no UDF, no window over the corpus.

    Deliberate rescan-over-materialize choice (r10 scan audit): the
    plan reads the input up to 4× (votes, scrub-keep, output join,
    fallback) rather than checkpointing the exploded line corpus —
    the explode output is corpus-sized-plus, so materializing it costs
    more than column-pruned parquet re-reads.  Callers whose input is
    an EXPENSIVE upstream plan (not a zone/parquet read) should
    checkpoint it themselves before calling.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lang", lang_pred_expr(F.col("_line")))
    votes = (
        lines.filter(F.col("_lang") != "und")
        .groupBy("_id", "_lang")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_doc = votes.groupBy("_id").agg(
        # ties -> lexicographically greatest code (deterministic)
        F.max_by(
            F.col("_lang"), F.struct(F.col("_n"), F.col("_lang"))
        ).alias("doc_lang"),
        F.sum("_n").alias("_voted"),
        F.max_by(F.col("_n"), F.struct(F.col("_n"), F.col("_lang")))
        .alias("_maj_n"),
    ).select(
        "_id",
        "doc_lang",
        F.round(F.col("_maj_n") / F.col("_voted"), 6).alias("lang_line_share"),
    )
    out = df.join(
        per_doc.withColumnRenamed("_id", id_col), id_col, "left"
    ).withColumn("doc_lang", F.coalesce(F.col("doc_lang"), F.lit("und")))
    out = out.withColumn(
        "lang_line_share", F.coalesce(F.col("lang_line_share"), F.lit(1.0))
    )
    if not scrub:
        return out
    keep = (
        lines.join(
            per_doc.select("_id", "doc_lang"), "_id"
        )
        .filter((F.col("_lang") == F.col("doc_lang")) | (F.col("_lang") == "und"))
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s._line,
                ),
                "\n",
            ).alias("scrubbed_text")
        )
        .withColumnRenamed("_id", id_col)
    )
    return out.join(keep, id_col, "left").withColumn(
        "scrubbed_text",
        F.coalesce(F.col("scrubbed_text"), F.col(text_col)),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-voting language identification.

    Counts per-language marker-word hits and takes the argmax
    (ties broken by language code order).  A real deployment would use
    character n-gram profiles; the plumbing — pure column expressions,
    no shuffle — is identical.
    """
    langs = sorted(LANG_MARKERS)

    def _in_set(markers: tuple[str, ...]):
        # NB: the lambda must take exactly one arg — PySpark inspects
        # arity and would bind a default arg to the element index column
        return lambda x: x.isin(*markers)

    # r14: the old two-projection form (scores, then pred referencing
    # them) collapsed into ONE projection, inlining each score — and
    # its ``split()`` — into every reference site: ~16 tokenizations
    # per document.  Let-bind instead: the token array and the score
    # struct are each a transform lambda VARIABLE (evaluated once),
    # and ``inline`` is the projection barrier that turns the single
    # struct into real output attributes.  Same scores, same argmax,
    # same column order.
    def _scores(t: Column) -> Column:
        return F.struct(
            *[
                F.size(F.filter(t, _in_set(LANG_MARKERS[lang]))).alias(
                    f"score_{lang}"
                )
                for lang in langs
            ]
        )

    def _with_pred(sv: Column) -> Column:
        best = F.greatest(*[sv[f"score_{lang}"] for lang in langs])
        pred = F.lit(None)
        # first language (in sorted order) achieving the max wins
        for lang in reversed(langs):
            pred = F.when(sv[f"score_{lang}"] == best, F.lit(lang)).otherwise(pred)
        return F.struct(
            *[sv[f"score_{lang}"].alias(f"score_{lang}") for lang in langs],
            F.when(best > 0, pred).otherwise(F.lit("und")).alias(out_col),
        )

    full = F.transform(F.transform(F.array(tokens(text_col)), _scores), _with_pred)
    return df.select("*", F.inline(full))


def winnow_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    gram_k: int = 3,
    window: int = 8,
    out_col: str = "winnow_fp",
) -> DataFrame:
    """Winnowing document fingerprint over token k-gram rolling hashes
    (the MOSS scheme: hash every k-gram, keep the minimum of each
    sliding window — guarantees shared substrings of length ≥ w+k−1
    share a fingerprint hash).

    Pure array expressions: grams → md5-derived 32-bit hashes → per-
    window minima → sorted distinct selection joined to a string.  One
    pass per document, no shuffle.
    """
    # An outer EXPRESSION referenced inside a HOF lambda re-evaluates per
    # element (O(n²) blowup); an ATTRIBUTE is a cheap lookup.  The two
    # repartition barriers below force the token and hash arrays to
    # materialize as attributes before the sliding windows read them.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    with_t = df.withColumn("_wt", tokens(text_col)).repartition(parallelism)

    t = F.col("_wt")
    n = F.size(t)
    grams = F.when(
        n >= gram_k,
        F.transform(
            F.sequence(F.lit(1), n - (gram_k - 1)),
            lambda i: F.array_join(F.slice(t, i, gram_k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
    )
    with_h = with_t.withColumn("_wh", hashes).repartition(parallelism)

    h = F.col("_wh")
    m = F.size(h)
    mins = F.when(
        m >= window,
        F.transform(
            F.sequence(F.lit(1), m - (window - 1)),
            lambda i: F.array_min(F.slice(h, i, window)),
        ),
    ).otherwise(
        F.when(m > 0, F.array(F.array_min(h))).otherwise(F.array().cast("array<bigint>"))
    )
    fp = F.array_join(
        F.transform(F.array_sort(F.array_distinct(mins)), lambda x: x.cast("string")), ","
    )
    return with_h.withColumn(out_col, fp).drop("_wt", "_wh")


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 4,
                out_col: str = "fingerprint") -> DataFrame:
    """K-min-sketch document fingerprint: the ``k`` lexicographically
    smallest md5 hashes of the distinct tokens, joined.  A compact
    content signature robust to token reordering — the rolling-hash
    family of document fingerprints."""
    t = F.array_distinct(tokens(text_col))
    hashed = F.array_sort(F.transform(t, lambda x: F.md5(x)))
    return df.withColumn(out_col, F.array_join(F.slice(hashed, 1, k), ""))


def token_ngrams(col: str | Column, n: int) -> Column:
    """Token n-grams as a space-joined string array (empty below n
    tokens)."""
    t = tokens(col) if isinstance(col, str) else col
    size = F.size(t)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Gopher-style repetition quality features (Rae et al. 2021,
    "Scaling Language Models", App. A1.1 repetition filters): per doc
    the fraction of n-gram instances belonging to repeated n-grams and
    the share of the single most frequent n-gram.

    Shape: ONE tokenize + ONE explode over the concatenated per-n gram
    arrays (each gram tagged with its n in a struct), a (doc, n, gram)
    count, then a per-doc conditional aggregation — the corpus is
    scanned once (a union branch per n would re-read and re-tokenize
    it |ns| times), two key shuffles, and no per-row O(len²) array
    aggregation, so a 1M-token document costs the same per token as a
    100-token one.  Output columns per n: ``top{n}gram_frac`` (count
    of the modal n-gram / total instances) and ``dup{n}gram_frac``
    (instances of grams seen >1 time / total).
    """
    t = F.col("_rf_toks")
    # repartition barrier: materialize the token array as an ATTRIBUTE
    # before the gram HOFs read it — CollapseProject would otherwise
    # re-inline the split() per n-gram branch (measured 2x slower).
    # A localCheckpoint barrier was measured 1.8x SLOWER at sf0.1 (min
    # 4.7s vs 2.6s): with a single downstream consumer the pipelined
    # shuffle beats eager block serialization; checkpointing only wins
    # for multi-consumer frames (see dedup.shingle_hash_frame).  On a
    # real cluster the shuffle is network-bound — re-measure there.
    base = df.select(id_col, tokens(text_col).alias("_rf_toks")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )

    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("_n"), g.alias("gram"))

    tagged = F.concat(*[F.transform(token_ngrams(t, n), _tag(n)) for n in ns])
    exploded = base.select(id_col, F.explode(tagged).alias("_g")).select(
        id_col, F.col("_g._n").alias("_n"), F.col("_g.gram").alias("gram")
    )
    counts = exploded.groupBy(id_col, "_n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_n = counts.groupBy(id_col, "_n").agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("top"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)).alias("dup"),
    )
    aggs = []
    for n in ns:
        is_n = F.col("_n") == n
        aggs.append(
            F.round(
                F.max(F.when(is_n, F.col("top") / F.col("total"))), 6
            ).alias(f"top{n}gram_frac")
        )
        aggs.append(
            F.round(
                F.max(F.when(is_n, F.col("dup") / F.col("total"))), 6
            ).alias(f"dup{n}gram_frac")
        )
    return per_n.groupBy(id_col).agg(*aggs)


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 App. C / PaLM 13-gram
    overlap check): count, per training document, its distinct token
    n-grams that appear anywhere in the benchmark corpus.

    Scale shape: the benchmark's distinct grams are tiny next to the
    corpus — md5-digested (fixed-width join key) and broadcast; the
    training side explodes per-doc DISTINCT grams and hits are a
    broadcast equi-join + one groupBy(doc).  The corpus shuffles once,
    on doc id, with narrow rows.  Returns every train row with
    ``n_overlap`` and a ``contaminated`` flag; compose with an anti
    join (``decontaminate``) to drop.
    """
    # tokenize below an explicit-N exchange, n-grams from the token
    # attribute above it (r14 — O(len²)-re-tokenization + single-scan-
    # task fix; full rationale at contamination_score)
    ncores = train.sparkSession.sparkContext.defaultParallelism
    ttoks = train.select(id_col, tokens(F.col(text_col)).alias("_t")).repartition(
        ncores
    )
    tg = ttoks.select(
        id_col,
        F.explode(F.array_distinct(token_ngrams(F.col("_t"), n))).alias("gram"),
    ).select(id_col, F.md5("gram").alias("_gh"))
    btoks = benchmark.select(tokens(F.col(text_col)).alias("_t")).repartition(ncores)
    bg = (
        btoks.select(
            F.explode(F.array_distinct(token_ngrams(F.col("_t"), n))).alias("gram")
        )
        .select(F.md5("gram").alias("_gh"))
        .distinct()
    )
    hits = tg.join(F.broadcast(bg), "_gh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )


def contamination_score(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Graded contamination: per training document, its DISTINCT token
    n-gram count, how many appear in the benchmark, and the overlap
    fraction — the severity signal behind partial-overlap policies
    (e.g. "drop > 50 % overlapped, keep but downweight 1-gram-hit
    docs"), where :func:`ngram_contamination`'s boolean only supports
    drop/keep.

    One pass over the exploded grams: the benchmark's distinct digests
    broadcast with a hit marker, a LEFT join preserves non-hit grams
    (bg is distinct, so the join never multiplies rows), and a single
    groupBy(doc) counts totals and hits together — same scale shape as
    the boolean operator (corpus shuffles once, on the id key, narrow
    rows), one extra column.  Zero-gram docs (shorter than n tokens)
    keep frac 0.0 rather than NULL-dividing.
    """
    # Work placement (r14, the shingle_hash_frame pattern): tokenize
    # ONCE below an explicit-N round-robin exchange, build the n-grams
    # from the materialized token ATTRIBUTE above it.  The old form
    # referenced the raw ``split()`` expression inside the n-gram
    # lambda (re-tokenizing the document once per gram, O(len²)) and
    # ran the whole gram+md5 build inside the single scan task of a
    # one-file corpus; the exchange is both the CollapseProject
    # barrier and the core spread (explicit N — AQE never coalesces a
    # user-numbered repartition, unlike a keyed shuffle of a few MB).
    ncores = train.sparkSession.sparkContext.defaultParallelism
    ttoks = train.select(id_col, tokens(F.col(text_col)).alias("_t")).repartition(
        ncores
    )
    tg = ttoks.select(
        id_col,
        F.explode(F.array_distinct(token_ngrams(F.col("_t"), n))).alias("gram"),
    ).select(id_col, F.md5("gram").alias("_gh"))
    btoks = benchmark.select(tokens(F.col(text_col)).alias("_t")).repartition(ncores)
    bg = (
        btoks.select(
            F.explode(F.array_distinct(token_ngrams(F.col("_t"), n))).alias("gram")
        )
        .select(F.md5("gram").alias("_gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = tg.join(F.broadcast(bg), "_gh", "left").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"),
    )
    return (
        train.join(per_doc, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)).cast("long"))
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long"))
        .withColumn(
            "overlap_frac",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_overlap") / F.col("n_grams"), 9),
            ).otherwise(F.lit(0.0)),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Drop contaminated training documents (see
    ``ngram_contamination``)."""
    flagged = ngram_contamination(train, benchmark, text_col, id_col, n)
    return flagged.filter(~F.col("contaminated")).drop("n_overlap", "contaminated")


def _bloom_positions(gram: Column, k: int, n_bits: int) -> list[Column]:
    """k deterministic bit positions for a gram: independent md5 draws
    (gram salted with the probe index), 15 hex chars → 60-bit int,
    modulo the filter width.  Engine-portable (md5 + conv), no JVM
    hashing that another engine couldn't replay.

    The general (grouped / mergeable / geometry-recorded) form of this
    sketch lives in ``operators.sketches`` (``bloom_bits`` …
    ``bloom_occupancy``); this module keeps the fused n-gram
    decontamination specialization."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws("#", gram, F.lit(str(j)))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits).cast("long"),
        )
        for j in range(k)
    ]


def build_ngram_bloom(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 13,
    n_words: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom bitmask over the benchmark's distinct token
    n-grams as ONE row holding an ``array<long>`` of ``n_words``
    64-bit words (``n_words * 64`` bits total).

    The scale rationale (vs broadcasting raw gram digests, the
    ``ngram_contamination`` shape): a digest set costs ~16 B/gram
    broadcast; the Bloom costs ``n_words * 8`` bytes FIXED — at
    ~10 bits/gram it holds ~6.5 grams/word at ~1% false positives, so
    a 100 M-gram benchmark suite fits in ~128 MB instead of ~1.6 GB,
    and the corpus-side probe is scan-local array arithmetic (no join
    at all).  Membership errs only toward false POSITIVES — compose
    with :func:`bloom_decontaminate`'s exact verify for end-to-end
    exactness.

    Shape: benchmark grams → (word, mask) pairs → one
    map-side-combinable ``bit_or`` groupBy on word (≤ n_words groups)
    → densified into the fixed-width array on a single row (the 1-row
    broadcast-stats pattern; no driver collect).
    """
    n_bits = n_words * 64
    grams = (
        benchmark.select(
            F.explode(F.array_distinct(token_ngrams(text_col, n))).alias("gram")
        )
        .select(F.md5("gram").alias("_gh"))
        .distinct()
    )
    bits = grams.select(
        F.explode(F.array(*_bloom_positions(F.col("_gh"), k, n_bits))).alias("_pos")
    ).select(
        F.expr("_pos div 64").alias("_word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias("_mask"),
    )
    words = bits.groupBy("_word").agg(F.bit_or("_mask").alias("_bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("_word", "_bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_bits // 64 - 1).cast("long")),
            lambda w: F.coalesce(F.col("_m")[w], F.lit(0).cast("long")),
        ).alias("bloom_words")
    )


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_words: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Two-phase EXACT decontamination: Bloom prefilter, then the
    exact gram join only over bloom-positive documents.

    Phase 1 (scan-local, no join): every doc probes its distinct
    n-grams against the broadcast Bloom row — a doc is ``maybe``
    contaminated iff some gram has all ``k`` bits set.  The Bloom
    never misses a true gram (no false negatives), so phase 1 is a
    complete candidate generator; clean docs — the overwhelming
    majority of a 100 TB corpus — never reach a shuffle.

    Phase 2: :func:`ngram_contamination`'s broadcast equi-join runs
    only on the ``maybe`` subset, striking the Bloom's false
    positives.  Output schema matches ``ngram_contamination`` (every
    train row + ``n_overlap`` + ``contaminated``) — equivalence with
    the single-phase exact operator is property-tested.
    """
    n_bits = n_words * 64
    bloom = build_ngram_bloom(benchmark, text_col, n, n_words, k)

    # the probe predicate is one SQL expression over the gram array so
    # it stays inside whole-stage codegen; positions are the same
    # salted-md5 arithmetic as build_ngram_bloom (on the gram digest)
    probes = []
    for j in range(k):
        h = f"CAST(conv(substring(md5(concat_ws('#', md5(g), '{j}')), 1, 15), 16, 10) AS BIGINT) % {n_bits}"
        probes.append(
            f"(element_at(bloom_words, CAST(({h}) div 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(({h}) % 64 AS INT))) <> 0"
        )
    gram_hit = " AND ".join(probes)
    maybe_expr = F.expr(
        f"exists(_grams, g -> {gram_hit})"
    )

    with_grams = train.crossJoin(F.broadcast(bloom)).withColumn(
        "_grams", F.array_distinct(token_ngrams(text_col, n))
    )
    flagged = with_grams.withColumn("_maybe", maybe_expr)
    maybe_docs = flagged.filter(F.col("_maybe")).drop(
        "_grams", "_maybe", "bloom_words"
    )
    verified = ngram_contamination(maybe_docs, benchmark, text_col, id_col, n)
    hits = verified.select(id_col, "n_overlap").filter(F.col("n_overlap") > 0)
    return (
        train.join(hits, id_col, "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )


def deterministic_uniform(id_col: str | Column, salt: str = "sample") -> Column:
    """Reproducible per-row uniform in [0, 1): md5 of (salt, id) — the
    same row draws the same number on any engine, any run, any
    partitioning.  The sampling analog of the md5 seed-ordering used by
    the IVF index build."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("_", F.lit(salt), c.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    weight_col: str = "sample_weight",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the data-mixing
    primitive of a training corpus (upsample rare languages / domains,
    downsample dominant ones) with an importance weight so downstream
    statistics stay unbiased.

    A row survives iff its md5-uniform < its stratum's fraction; strata
    missing from ``fractions`` drop entirely.  Pure column expressions
    on the scan — no shuffle, no RNG state, and re-runs (or different
    cluster sizes) select the SAME rows, which makes sampled pipelines
    diffable run-over-run.  ``weight_col`` carries 1/fraction.
    """
    frac = F.lit(None).cast("double")
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    u = deterministic_uniform(id_col, salt)
    return (
        df.withColumn("_frac", frac)
        .filter(F.col("_frac").isNotNull() & (u < F.col("_frac")))
        .withColumn(weight_col, F.lit(1.0) / F.col("_frac"))
        .drop("_frac")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-token-size chunks with overlap — the
    sequence-prep step of a training/RAG pipeline (long doc → model-
    window pieces, overlap preserving cross-boundary context).

    Chunk i covers tokens [1 + i*stride, ...chunk_tokens] with
    stride = chunk_tokens - overlap; the final chunk may be short.
    Pure array expressions + one posexplode — scan-speed, no shuffle,
    and each input row expands to ceil(max(n-overlap,1)/stride) output
    rows regardless of partitioning.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(t, i * stride + 1, chunk_tokens), " "),
    )
    out = df.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.select(
        id_col,
        "chunk_id",
        F.size(F.split(F.col("chunk_text"), TOKEN_SPLIT_RE)).alias("n_chunk_tokens"),
        "chunk_text",
    )


# standard PII patterns (kept RE2-and-Java-compatible: no backrefs or
# lookarounds, so Spark and any oracle engine agree on matches)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    "phone": (r"\b\d{2,3}[- ]\d{3}[- ]\d{3,4}(?:[- ]\d{1,4})?\b", "[PHONE]"),
    "long_number": (r"\d{6,}", "[NUM]"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    count_col: str = "n_redactions",
    patterns: Mapping[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """PII scrubbing (the redact-before-training step): apply each
    (regex, token) replacement in deterministic name order, counting
    matches against the progressively redacted text so overlapping
    patterns are attributed to the first one that claims them.

    Pure ``regexp_extract_all``/``regexp_replace`` column expressions —
    scan-speed, no shuffle, no Python.  Patterns avoid backreferences
    and lookarounds so any RE2-class engine reproduces the matches.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    cur = F.col(text_col)
    total = F.lit(0)
    for name in sorted(pats):
        regex, token = pats[name]
        total = total + F.size(F.regexp_extract_all(cur, F.lit(regex), 0))
        cur = F.regexp_replace(cur, regex, token)
    return df.withColumn(count_col, total.cast("int")).withColumn(out_col, cur)


def luhn_valid(col: str | Column) -> Column:
    """Luhn checksum over a digit string, as pure column expressions
    (reverse → indexed transform doubling every second digit → sum
    fold): TRUE iff the mod-10 check passes.  The validator that
    separates real payment-card numbers from arbitrary digit runs —
    redacting every 16-digit number as a card would eat order ids and
    EAN barcodes; Luhn filtering keeps precision high.
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_extract_all(F.reverse(c), F.lit(r"[0-9]"), 0)
    contrib = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (F.size(digits) > 0) & (total % 10 == 0)


def redact_cards(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    count_col: str = "n_cards",
    token: str = "[CARD]",
) -> DataFrame:
    """Payment-card redaction: find 13–19 digit runs, keep only the
    Luhn-VALID ones, replace each occurrence with ``token``.

    Scan-shaped column expressions end to end — candidates via
    ``regexp_extract_all``, validation via :func:`luhn_valid` inside an
    array ``filter``, replacement via a boundary-anchored
    ``regexp_replace`` fold (no Python).  Each candidate is replaced as
    ``(?<![0-9])<num>(?![0-9])`` — a digit-bounded occurrence only — so
    a valid candidate that ALSO appears as a substring of a longer
    (>19-digit, non-candidate) run elsewhere in the document never
    partially rewrites that run (ADVICE r9).  Candidates are pure digit
    strings, so interpolating them into the pattern needs no quoting.
    Compose BEFORE :func:`redact_pii`: its ``long_number`` pattern
    would otherwise swallow card numbers into ``[NUM]`` and lose the
    card signal.
    """
    cands = F.array_distinct(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"\b[0-9]{13,19}\b"), 0
        )
    )
    valid = F.filter(cands, lambda c: luhn_valid(c))
    redacted = F.aggregate(
        valid,
        F.col(text_col),
        lambda acc, c: F.regexp_replace(
            acc,
            F.concat(F.lit("(?<![0-9])"), c, F.lit("(?![0-9])")),
            F.lit(token),
        ),
    )
    return df.withColumn(count_col, F.size(valid)).withColumn(out_col, redacted)


def pack_documents(
    df: DataFrame,
    budget: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic contiguous sequence packing: concatenate documents
    (in ``id_col`` order, per ``strata_col``) into training sequences of
    ``budget`` tokens; a document's pack is ``floor(tokens-before /
    budget)`` — the GPT-style pre-training batch layout, computed
    declaratively instead of with a driver-side greedy loop.

    Returns one row per (stratum, pack): document count, token total,
    and the [first_doc, last_doc] id range (contiguity by construction).

    Scale shape: one shuffle on the stratum key + an in-partition sort,
    then a partial-aggregated groupBy.  ``strata_col`` doubles as the
    parallelism unit — at 100 TB use a composite key (e.g. (lang,
    shard)) so a single giant language doesn't serialize into one
    window partition.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(text_col))
    counted = df.select(F.col(id_col), F.col(strata_col), n_tok.alias("_n_tok"))
    packed = counted.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("_n_tok").over(w), F.lit(0)) / F.lit(float(budget))
        ).cast("bigint"),
    )
    return packed.groupBy(strata_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tok").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


SENTENCE_SPLIT_RE = r"[.!?]\s+"


def boilerplate_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_chars: int = 20,
) -> DataFrame:
    """Sentence-level boilerplate detection (the pre-dedup step real
    training pipelines run before document-level near-dup removal):
    sentences repeated across ``min_docs``+ DISTINCT documents are
    navigation chrome, disclaimers, license headers.

    Splits on sentence punctuation, normalizes (lower/trim), drops
    fragments under ``min_chars``, and aggregates by md5 digest —
    explode + one groupBy on the digest, the same single-shuffle shape
    as exact dedup but at sentence grain.  Returns digest, distinct-doc
    count, total occurrences, and the (deterministic min) exemplar.
    """
    sent = F.explode(F.split(F.col(text_col), SENTENCE_SPLIT_RE)).alias("sent")
    norm = F.lower(F.trim(F.col("sent")))
    exploded = df.select(F.col(id_col), sent).select(
        F.col(id_col), norm.alias("sent")
    )
    filtered = exploded.filter(F.length("sent") >= min_chars)
    return (
        filtered.groupBy(F.md5(F.col("sent")).alias("sentence_digest"))
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("sent").alias("exemplar"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def scrub_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_chars: int = 20,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact line/paragraph scrub — the REMOVAL half of
    :func:`boilerplate_sentences` (RefinedWeb-style line dedup,
    Penedo et al. 2023 §3: lines repeated across the corpus are
    chrome/disclaimers; cut them from every document, keep the rest).

    A line is scrubbed when its normalized (lower/trim) digest occurs
    in ``min_docs``+ DISTINCT documents and the line has at least
    ``min_chars`` characters (short lines — headings, blanks, list
    bullets — repeat legitimately and are never candidates).

    Scale shape, all JVM expressions: ``posexplode`` the split text →
    ONE groupBy on the line digest (map-side combinable countDistinct
    approximated exactly via two-level agg) → the flagged-digest set
    joins back to the exploded lines on the digest equi-key (no
    broadcast assumption: boilerplate tables can be corpus-scale) →
    per-doc ordered reassembly with one groupBy on the id.  Three
    shuffles total, each on a natural key; no UDF, no window over the
    corpus.

    Returns (id, text_clean, n_lines, n_scrubbed).
    """
    import re as _re

    sep_re = _re.escape(sep)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re, -1)).alias("pos", "line"),
    )
    norm_digest = F.md5(F.lower(F.trim(F.col("line"))))
    keyed = lines.withColumn(
        "_d",
        F.when(F.length(F.trim(F.col("line"))) >= min_chars, norm_digest),
    )
    # distinct (digest, doc) first, then count docs per digest — two
    # map-side-combinable aggregates instead of a countDistinct whose
    # partials cannot combine
    flagged = (
        keyed.filter(F.col("_d").isNotNull())
        .select("_d", id_col).distinct()
        .groupBy("_d").agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_d", F.lit(True).alias("_scrub"))
    )
    marked = keyed.join(flagged, "_d", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_scrub"), 1).otherwise(0)).alias("n_scrubbed"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "pos",
                                    F.coalesce(F.col("_scrub"), F.lit(False)).alias(
                                        "scrub"
                                    ),
                                    "line",
                                )
                            )
                        ),
                        lambda s: ~s["scrub"],
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text_clean"),
        )
        .select(id_col, "text_clean", "n_lines", "n_scrubbed")
    )


def c4_rule_flags(
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 10000,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 10.0,
    min_stopword_ratio: float = 0.0125,
    max_punct_ratio: float = 0.2,
) -> dict[str, Column]:
    """The C4/Gopher rule expressions as named boolean columns — usable
    either as an audit table (:func:`c4_quality_filter`) or directly in
    a ``filter`` (:func:`c4_keep_expr`, zero-shuffle gating)."""
    t = tokens(text_col)
    c = F.col(text_col)
    n_tok = F.size(t)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    # mean token length over the non-separator chars (same convention as
    # quality_features: separators ~= n_tok - 1)
    mean_len = (n_chars - (n_tok - F.lit(1))) / n_tok
    return {
        "flag_too_short": n_tok < min_tokens,
        "flag_too_long": n_tok > max_tokens,
        "flag_bad_mean_token_len": (mean_len < mean_len_lo) | (mean_len > mean_len_hi),
        "flag_low_stopword": (n_stop / n_tok) < min_stopword_ratio,
        # n_chars can be 0 (empty doc): unguarded division yields NULL
        # in Spark but different division-by-zero semantics in other
        # engines, and a NULL flag would poison the combined `keep`
        # verdict to NULL instead of False.  An empty doc has no punct,
        # so the flag is deterministically False (flag_too_short still
        # rejects it: tokens('') is [''], n_tok == 1).
        "flag_high_punct": F.when(
            n_chars > 0, (n_punct / n_chars) > max_punct_ratio
        ).otherwise(F.lit(False)),
    }


def c4_keep_expr(text_col: str = "text", **rule_kw) -> Column:
    """The combined keep predicate as ONE column expression: gating a
    corpus is ``df.filter(c4_keep_expr("text"))`` — a pure scan, no
    join, no shuffle, and the predicate participates in whole-stage
    codegen."""
    flags = c4_rule_flags(text_col, **rule_kw)
    keep = F.lit(True)
    for f in flags.values():
        keep = keep & ~f
    return keep


def c4_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **rule_kw,
) -> DataFrame:
    """C4/Gopher-style heuristic quality gate (Raffel et al. 2020 §2.2,
    Rae et al. 2021 App. A1.1): per-rule boolean flags plus the combined
    ``keep`` verdict.  Per-rule flags (not just the verdict) are what a
    pipeline operator needs to tune thresholds against a corpus sample.

    Every rule is exact arithmetic over scan-local counts — no
    transcendental math, so the result is bit-identical across engines
    and the whole filter runs at parquet scan speed.
    """
    flags = c4_rule_flags(text_col, **rule_kw)
    keep = F.lit(True)
    for f in flags.values():
        keep = keep & ~f
    return df.select(
        F.col(id_col),
        *[f.alias(name) for name, f in flags.items()],
        keep.alias("keep"),
    )


def common_phrases(
    df: DataFrame,
    k: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
) -> DataFrame:
    """Phrase-level boilerplate mining: k-token phrases appearing in
    ``min_docs``+ DISTINCT documents.  The corpus-independent sibling of
    :func:`boilerplate_sentences` — works on text with no sentence
    punctuation, and is how filter lists (common n-grams to strip) get
    built in practice.

    Per-doc DISTINCT phrases (so a phrase repeated inside one document
    counts once), one explode + one groupBy on the phrase digest — the
    single-shuffle exact-dedup shape at phrase grain.
    """
    # Work placement (r14, same rationale + measurement pattern as
    # dedup.shingle_hash_frame): tokenize ONCE below a round-robin
    # exchange, build the k-token phrases from the materialized token
    # ATTRIBUTE above it.  Referencing the raw ``split()`` expression
    # inside the shingle lambda (the old ``shingles(text)`` form) made
    # Catalyst re-tokenize the document once per phrase — O(len²) —
    # and the whole projection ran inside the single scan task of a
    # one-file corpus; the exchange doubles as the CollapseProject
    # barrier and spreads the phrase build over every core.
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    t = F.col("_t")
    n = F.size(t)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(t, i, k), " "),
    )
    sh = F.when(n >= k, make).otherwise(F.array().cast("array<string>"))
    ph = F.explode(F.array_distinct(sh)).alias("phrase")
    exploded = toks.select(F.col(id_col), ph)
    # (doc, phrase) pairs are already distinct (array_distinct inside the
    # doc), so a plain count equals countDistinct(doc) — and avoids the
    # Expand-based distinct-aggregate plan that doubles the exploded
    # row volume through the shuffle
    return (
        exploded.groupBy(F.md5(F.col("phrase")).alias("phrase_digest"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("phrase").alias("exemplar"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (100, 1000, 10000),
) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocab size ``k``,
    the fraction of all token INSTANCES covered by the ``k`` most
    frequent tokens — the statistic that picks a tokenizer vocab size
    (the knee of this curve) and bounds the OOV rate (1 − coverage).

    Scale shape: one explode + one groupBy(token) builds the count
    table (vocab ≪ corpus), materialized once for all ``k``; each top-k
    is ``orderBy(...).limit(k)`` which compiles to
    TakeOrderedAndProject — per-partition top-k with a driver merge of
    k rows, never a single-partition global sort.  Ties break
    deterministically on (count DESC, token ASC) so engines agree on
    the exact top-k set.
    """
    tok = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = (
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        # one materialization feeds the total + every top-k consumer
        # (self-consumption is never exchange-reused; see dedup notes)
        .localCheckpoint()
    )
    total = counts.agg(F.sum("cnt").alias("total_tokens"))
    parts = []
    for k in ks:
        top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
        parts.append(
            top.agg(
                F.lit(k).cast("bigint").alias("k"),
                F.sum("cnt").alias("covered_tokens"),
            )
        )
    from functools import reduce

    per_k = reduce(lambda a, b: a.unionByName(b), parts)
    return per_k.crossJoin(F.broadcast(total)).select(
        "k",
        "covered_tokens",
        "total_tokens",
        F.round(F.col("covered_tokens") / F.col("total_tokens"), 6).alias("coverage"),
    )


def unigram_logloss(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram model
    — the CCNet-style "perplexity filtering" signal (Wenzek et al.
    2020): documents whose token distribution diverges from the corpus
    (gibberish, wrong language, boilerplate soup) score high and land
    in the tail bucket.  A real deployment scores against an external
    LM; the self-trained unigram keeps the pipeline shape (model table
    broadcast against the exploded corpus) with zero dependencies.

    Scale shape: token-count model = one groupBy(token) over the
    exploded corpus (vocab ≪ corpus, map-side combined); scoring joins
    each (doc, token) INSTANCE to the vocab-sized model, and that join
    is FORCE-broadcast: left to the planner it could pick a
    shuffled join that moves the entire exploded corpus on the token
    key — a Zipf-skewed key where "the" alone is a mega-hot partition.
    The model is bounded by vocab size, exactly the "dims always
    broadcast" rule.  ln() is transcendental, so the result is rounded
    to 6 decimals on both engines (playbook rule).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    # vocab-sized; checkpoint before fan-out — the model feeds both the
    # total broadcast and the probs projection, so without the cut the
    # corpus explode+groupBy runs once per consumer (3 corpus scans in
    # the plan, r10 audit).  Scoring still re-reads the corpus once:
    # the inherent minimum for a self-trained model.
    model = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()
    total = model.agg(F.sum("cnt").cast("double").alias("_total"))
    probs = model.crossJoin(F.broadcast(total)).select(
        "token", (F.col("cnt") / F.col("_total")).alias("p")
    )
    scored = tok.join(F.broadcast(probs), "token")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round((-F.sum(F.log("p")) / F.count(F.lit(1))), 6).alias(
                "cross_entropy"
            ),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of a TARGET-domain unigram LM
    against the whole-corpus LM — documents that look like the target
    domain get high weight, and sampling proportionally to the weight
    reshapes the corpus toward the target.  ``target_pred`` is a
    boolean column expression selecting the in-domain rows (DSIR's
    "target distribution sample").

    weight(d) = Σ_t c_t(d) · ln(p_tgt(t) / p_all(t)), with add-one
    smoothing on the target counts over the CORPUS vocabulary so
    out-of-target tokens contribute a finite negative term.  Per-token
    terms quantize to nano-units and sum as BIGINT (order-free — the
    same fixed-point rule as ``token_distribution_drift``), then scale
    back at the end; only the final weight is rounded (6 dp).

    Scale shape: both LMs are ONE groupBy over the exploded corpus
    (the target counts ride the same aggregate via a conditional sum —
    no second scan); the score table is vocab-bounded and
    FORCE-broadcast into the per-instance scoring join, exactly the
    ``unigram_logloss`` posture.
    """
    tok = df.select(
        F.col(id_col),
        target_pred.alias("_tgt"),
        F.explode(tokens(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    # counts feeds the totals AND the score table — without the cut
    # each consumer re-explodes the corpus through counts' lineage;
    # the frame itself is vocab-sized, so the corpus is exploded
    # exactly twice (model build + scoring join, the unigram shape)
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_tgt"),
    ).localCheckpoint()
    tot = counts.agg(
        F.sum("c_all").alias("t_all"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    # p_tgt = (c_tgt + 1) / (t_tgt + V); p_all = c_all / t_all
    ratio = F.log(
        (F.col("c_tgt") + 1).cast("double")
        / (F.col("t_tgt") + F.col("vocab")).cast("double")
    ) - F.log(F.col("c_all").cast("double") / F.col("t_all").cast("double"))
    scores = counts.crossJoin(F.broadcast(tot)).select(
        "token", F.round(ratio * F.lit(1e9)).cast("long").alias("_rq")
    )
    scored = tok.join(F.broadcast(scores), "token")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("_rq") / F.lit(1e9), 6).alias("dsir_weight"),
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    bg: DataFrame | None = None,
    uni: DataFrame | None = None,
) -> DataFrame:
    """Adjacent-bigram collocation mining by pointwise mutual
    information (Church & Hanks 1990) — the classic signal for phrase
    vocabulary induction / tokenizer merges over a training corpus.

    PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over bigram
    instances and p(·) over token instances.  All counts are exact
    BIGINTs; only the final ln is transcendental, so the result rounds
    to 6 decimals on both engines (playbook rule).

    Scale shape: bigrams come from one ``zip_with`` of the token array
    against its own tail — zero extra tokenize passes — then ONE
    groupBy(bigram); the two unigram-probability joins broadcast the
    vocab-sized count table (the same "dims always broadcast" rule as
    ``unigram_logloss``, and the same Zipf-skew hazard if left to a
    shuffled join).  Totals ride in via broadcast crossJoin.

    ``bg`` / ``uni`` (r15, guide §2.4): fused audit rows that already
    hold the exploded-bigram frame and/or the (token, n_tok) unigram
    count table pass them in so the corpus is exploded once for the
    whole row; semantics are identical — the defaults derive both from
    ``df`` exactly as before.
    """
    t = tokens(text_col)
    if bg is None:
        n = F.size(t)
        pairs = F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        bg = df.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    else:
        bg = bg.select("w1", "w2")
    # vocab-sized count tables; checkpoint before fan-out — uni feeds
    # its total plus TWO broadcast joins and bg_counts feeds its total
    # plus the scored join, so without the cut each corpus-sized
    # explode+groupBy re-runs per consumer (8 token-corpus scans in the
    # plan, r10 audit)
    bg_counts = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_ab")
    ).localCheckpoint()
    if uni is None:
        uni = (
            df.select(F.explode(t).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_tok"))
        )
    uni = uni.localCheckpoint()
    tot_uni = uni.agg(F.sum("n_tok").cast("double").alias("_t"))
    tot_bg = bg_counts.agg(F.sum("n_ab").cast("double").alias("_b"))
    scored = (
        bg_counts.filter(F.col("n_ab") >= min_count)
        .join(F.broadcast(uni.select(F.col("token").alias("w1"), F.col("n_tok").alias("n_a"))), "w1")
        .join(F.broadcast(uni.select(F.col("token").alias("w2"), F.col("n_tok").alias("n_b"))), "w2")
        .crossJoin(F.broadcast(tot_bg))
        .crossJoin(F.broadcast(tot_uni))
    )
    pmi = F.log(
        (F.col("n_ab") / F.col("_b"))
        / ((F.col("n_a") / F.col("_t")) * (F.col("n_b") / F.col("_t")))
    )
    return scored.select(
        "w1", "w2", "n_ab", F.round(pmi, 6).alias("pmi")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-document top-k terms by tf·idf — keyword extraction over the
    corpus (idf = ln(N/df), the textbook Salton form; no smoothing so
    the arithmetic is exactly mirrorable in SQL).

    Scale shape: one tokenize + explode feeds BOTH the per-(doc, term)
    tf counts and the document-frequency table; df is vocab-sized and
    broadcast into the scoring join; the per-doc top-k is a window over
    rows already partitioned by the tf groupBy's doc key.  Ties break
    on the term string so ranks are deterministic cross-engine.

    ``tf`` (r15): a precomputed (id, term, tf) frame from a fused audit
    row; the default derives it from ``df`` exactly as before.
    """
    if tf is None:
        tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(n_docs))
    tfidf = F.round(F.col("tf") * F.log(F.col("_n") / F.col("df_t")), 6)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.select(F.col(id_col), "term", "tf", tfidf.alias("tfidf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document's text WITHOUT the tokens covered by the
    given span table — the scrub action that completes exact-substring
    dedup (Lee et al. 2022 §4: cut the duplicated spans, keep the
    rest; which occurrences to cut is policy and belongs upstream in
    the span table, e.g. "all spans" for symmetric removal or
    "non-canonical occurrences only" to keep one copy).

    Scale shape: spans collapse to one array per doc (groupBy on the
    doc key), join back on the same key (a 1:1 keyed join — spans are
    sparse, AQE broadcasts when small), then the rebuild is pure array
    expressions: an index-aware ``filter`` drops covered positions and
    ``array_join`` re-concatenates — no shuffle beyond the one keyed
    join, no UDF.

    Returns (id, text_clean, n_removed).
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    t = tokens(text_col)
    covered = lambda x, i: F.exists(  # noqa: E731 — HOF lambda pair
        F.col("_spans"),
        lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
    )
    kept = F.when(F.col("_spans").isNull(), t).otherwise(
        F.filter(t, lambda x, i: ~covered(x, i))
    )
    return (
        df.join(sp, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("text_clean"),
            (F.size(t) - F.size(kept)).alias("n_removed"),
        )
    )


def stratified_topk(
    df: DataFrame,
    k: int = 5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum quality selection: the top-``k`` documents of each
    stratum by composite quality score — the "keep the best N per
    domain/language" step of corpus mixing (the greedy counterpart of
    :func:`stratified_sample`'s rate-based mix).

    Scale shape: features are scan-local (``quality_features``), so
    the only shuffle is the per-stratum window; ranks tie-break on the
    doc id for cross-engine determinism, and the score is ROUNDED
    before ranking so both engines order the same values.
    """
    feats = quality_features(df.select(id_col, strata_col, text_col), text_col)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    return (
        feats.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(strata_col, id_col, "quality_score", "rank")
    )


def domain_mixture_weights(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled domain mixture weights: ``w_d ∝ share_d^α``
    — the standard rebalancing between natural sampling (α=1) and
    uniform-over-domains (α=0) used for multilingual/multi-domain
    pretraining mixes (e.g. the α-smoothed sampling of XLM-R and the
    mixture-reweighting setting DoReMi optimizes over).  ``boost`` is
    the resampling factor each domain needs relative to its natural
    share.

    Scale shape: one groupBy on the domain key over scan-local token
    counts (map-side combined), then two broadcast totals — the output
    is domain-cardinality-sized, never corpus-sized.  ``pow`` is
    transcendental, so outputs round to 6 decimals on both engines
    (playbook rule).
    """
    tc = df.groupBy(strata_col).agg(
        F.sum(token_count(text_col)).alias("n_tokens")
    # strata-cardinality rows; checkpoint before fan-out — tc feeds the
    # total broadcast AND the share projection (and sc below feeds two
    # more consumers), so without the cut the corpus token count runs
    # once PER consumer: 4 full scans in the plan (r10 plan audit)
    ).localCheckpoint()
    total = tc.agg(F.sum("n_tokens").cast("double").alias("_t"))
    sh = tc.crossJoin(F.broadcast(total)).select(
        strata_col,
        "n_tokens",
        (F.col("n_tokens") / F.col("_t")).alias("_share"),
    )
    sc = sh.withColumn("_sw", F.pow(F.col("_share"), F.lit(alpha)))
    wsum = sc.agg(F.sum("_sw").alias("_s"))
    return sc.crossJoin(F.broadcast(wsum)).select(
        strata_col,
        "n_tokens",
        F.round(F.col("_share"), 6).alias("share"),
        F.round(F.col("_sw") / F.col("_s"), 6).alias("weight"),
        F.round((F.col("_sw") / F.col("_s")) / F.col("_share"), 6).alias("boost"),
    )


def tokenizer_fertility(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum tokenizer fertility: sub-word tokens per whitespace
    word (the standard metric for how well a tokenizer fits each
    language/domain — fertility ≫ 1 flags scripts the vocab splinters).
    Uses the BPE-ish regex segmentation so the measure is deterministic
    and engine-portable.  Scan-local counts + one groupBy — the output
    is stratum-sized."""
    ws = token_count(text_col)
    bpe = F.size(bpe_ish_tokens(text_col))
    agg = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_tokens"),
    )
    return agg.select(
        strata_col,
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.round(
            F.col("bpe_tokens").cast("double") / F.col("ws_tokens"), 6
        ).alias("fertility"),
    )


def bigram_logloss(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bg: DataFrame | None = None,
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own BIGRAM model
    — the conditional upgrade of :func:`unigram_logloss` (CCNet scores
    with a 5-gram KenLM; the self-trained bigram keeps the exact
    pipeline shape with zero dependencies).  p(w₂|w₁) =
    c(w₁w₂)/c(w₁·), so every corpus bigram has positive probability —
    no smoothing needed for a self-trained filter signal.

    Scale note: unlike the unigram model, the bigram table is NOT
    vocab-bounded (worst case vocab²), so the scoring join shuffles on
    the composite (w1, w2) key — which is also far less Zipf-skewed
    than a single-token key; the left-count table IS vocab-bounded and
    broadcasts into the model build.  ln rounds to 6 (playbook rule).

    ``bg`` (r15): a pre-MATERIALIZED (id, w1, w2) exploded-bigram frame
    from a fused audit row (must be checkpointed by the caller); the
    default derives and checkpoints it from ``df`` exactly as before.
    """
    if bg is None:
        t = tokens(text_col)
        n = F.size(t)
        pairs = F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        # bg feeds THREE consumers (bigram model, left counts, scoring
        # join) — the materialization rule (NOTES r4): without a hard
        # checkpoint each branch re-tokenizes and re-explodes the
        # corpus, three full scans at scale for one logical pass
        bg = df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
            id_col, "bg.w1", "bg.w2"
        ).localCheckpoint()
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    left = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_a"))
    probs = model.join(F.broadcast(left), "w1").select(
        "w1", "w2", (F.col("c_ab") / F.col("c_a")).alias("p")
    )
    scored = bg.join(probs, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.sum(F.log("p")) / F.count(F.lit(1)), 6).alias("cross_entropy"),
    )


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — the tokenizer-training
# primitive, unrolled as pure DataFrame ops.  Each iteration is one
# distributed pair-count over the (vocab-sized) word table, a 1-row
# top-1, and a broadcast merge application — exactly how BPE trains on
# a 100 TB corpus: the corpus is touched ONCE (word histogram); every
# iteration after that runs on the histogram, whose size is the vocab,
# not the corpus.  No floats anywhere, so any engine replays it
# bit-exactly.

BPE_SEP = "\x1f"  # unit separator — cannot occur in whitespace tokens


def _bpe_encode(word: Column) -> Column:
    """Word → separator-framed symbol string: ``␟␟c1␟␟c2␟␟``.  The
    double separator between symbols plus the single-separator-framed
    merge pattern (``␟l␟␟r␟`` → ``␟lr␟``) makes literal left-to-right
    ``replace`` exactly the greedy non-overlapping BPE merge, with no
    false matches across symbol boundaries."""
    ss = BPE_SEP * 2
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )
    return F.concat(F.lit(ss), F.array_join(chars, ss), F.lit(ss))


def bpe_merge_table(
    df: DataFrame, text_col: str = "text", n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Returns (step, left, right, pair_count) — count desc, then
    (left, right) lexicographic tie-break, the deterministic variant
    of the classic algorithm.  Pair counts weight by word frequency
    and count every adjacent occurrence; application is greedy
    left-to-right non-overlapping (so ``a a a`` under merge (a,a)
    becomes ``aa a``).

    Each iteration's word table and 1-row winner are localCheckpointed:
    without the cut, iteration k's lineage re-derives every prior
    iteration AND re-scans the corpus per branch (the self-join
    exchange-reuse gap measured for the dedup family — NOTES r4)."""
    s, ss = BPE_SEP, BPE_SEP * 2
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    cur = words.select(_bpe_encode(F.col("word")).alias("enc"), "weight")
    cur = cur.localCheckpoint()  # corpus touched once, here
    merges = None
    for step in range(1, n_merges + 1):
        syms = F.filter(F.split(F.col("enc"), ss), lambda x: x != "")
        pairs = F.when(
            F.size(syms) > 1,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("l"),
                    F.element_at(syms, (i + 1).cast("int")).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        pc = (
            cur.select(F.explode(pairs).alias("p"), "weight")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("weight").alias("pair_count"))
        )
        top = (
            pc.orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .select(F.lit(step).alias("step"), "l", "r", "pair_count")
            .localCheckpoint()
        )
        merges = top if merges is None else merges.unionByName(top)
        pat = F.concat(F.lit(s), F.col("l"), F.lit(ss), F.col("r"), F.lit(s))
        rep = F.concat(F.lit(s), F.col("l"), F.col("r"), F.lit(s))
        cur = (
            cur.crossJoin(F.broadcast(top.select("l", "r")))
            .select(F.replace(F.col("enc"), pat, rep).alias("enc"), "weight")
            .localCheckpoint()
        )
    return merges.select(
        "step", F.col("l").alias("left"), F.col("r").alias("right"), "pair_count"
    )


def bpe_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one distributed corpus pass BPE training needs: the word
    frequency histogram.  Map-side-combinable groupBy — output is
    vocab-sized, not corpus-sized."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def bpe_learn_merges(
    word_weights: Mapping[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Incremental BPE merge learning over a word histogram (Sennrich
    et al. 2016 with the standard pair-delta optimization): per merge,
    ONLY the words containing the winning pair are re-segmented, and
    pair counts update by the delta between their old and new
    adjacencies — never a full recount.  A lazy-invalidation heap
    yields the (count desc, (l, r) lex asc) winner in O(log P).

    Semantics are identical to :func:`bpe_merge_table`: counts weight
    by word frequency, every adjacent occurrence counts, application
    is greedy left-to-right non-overlapping (``a a a`` under (a, a) →
    ``aa a``).  Returns up to ``n_merges`` (left, right, pair_count)
    tuples, stopping early when no pair remains.

    This is the realistic-merge-count path (32k merges): per-iteration
    cost is O(words containing the pair), independent of vocab size.
    The iterative :func:`bpe_merge_table` (one Spark job pair-recount
    per merge) stays as the fully-distributed, oracle-replayed tier —
    crossover in practice: use the distributed tier when the merge
    count is small (≲ tens) or the histogram exceeds driver memory;
    this path otherwise.  A 1M-word histogram is ~tens of MB — the
    same driver-side model-fitting status as the LW coefficient table.
    """
    import heapq
    from collections import defaultdict

    words: dict[int, tuple[str, ...]] = {}
    weights: dict[int, int] = {}
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wid, (word, weight) in enumerate(sorted(word_weights.items())):
        syms = tuple(word)
        words[wid] = syms
        weights[wid] = weight
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += weight
            pair_words[pair].add(wid)

    # heap of (-count, l, r); stale entries are skipped on pop by
    # validating against the live count
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)

    def merge_word(syms: tuple[str, ...], l: str, r: str) -> tuple[str, ...]:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, l, r = heapq.heappop(heap)
        count = pair_counts.get((l, r), 0)
        if count <= 0:
            continue
        if -negc != count:  # stale entry — re-queue at the live count
            heapq.heappush(heap, (-count, l, r))
            continue
        merges.append((l, r, count))
        touched: set[tuple[str, str]] = set()
        for wid in list(pair_words[(l, r)]):
            old = words[wid]
            new = merge_word(old, l, r)
            w = weights[wid]
            for pair in zip(old, old[1:]):
                pair_counts[pair] -= w
                pair_words[pair].discard(wid)
                touched.add(pair)
            for pair in zip(new, new[1:]):
                pair_counts[pair] += w
                pair_words[pair].add(wid)
                touched.add(pair)
            words[wid] = new
        for pair in touched:
            c = pair_counts.get(pair, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pair[0], pair[1]))
            else:
                pair_counts.pop(pair, None)
                pair_words.pop(pair, None)
    return merges


def bpe_merge_table_fast(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    max_vocab: int = 2_000_000,
    min_count: int = 1,
) -> DataFrame:
    """BPE merge table at realistic merge counts: ONE distributed
    corpus pass (the word histogram), then driver-side incremental
    learning (:func:`bpe_learn_merges`).  Output schema and semantics
    match :func:`bpe_merge_table` exactly (parity-tested) — this is
    the path that completes 32k merges in bounded time, where the
    per-merge-Spark-job tier caps out around tens of merges.

    ``max_vocab`` guards the driver collect: the histogram is
    model-fitting state (vocab-sized), but a corpus whose vocab
    exceeds the bound should raise loudly rather than OOM the driver.

    ``min_count`` (default 1 = off; the oracle path never sets it)
    prunes histogram words with weight < min_count BEFORE the collect
    — the standard BPE-trainer approximation (every real trainer does
    this): a 100 TB corpus's whitespace vocab is dominated by a heavy
    tail of near-singleton words whose total pair mass is negligible,
    so dropping them leaves the top merges unchanged in practice while
    bounding the collect BY CONSTRUCTION — at most
    total_tokens / min_count words can survive the filter, independent
    of how heavy the tail is.  This is an approximation knob, not an
    exactness guarantee: a pair could in principle lose ≤
    (min_count − 1) · |pruned words containing it| of its count;
    choose min_count ≪ the expected winning pair counts.
    """
    spark = df.sparkSession
    hist = bpe_word_histogram(df, text_col)
    if min_count > 1:
        hist = hist.filter(F.col("weight") >= min_count)
    n_vocab = hist.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"word histogram has {n_vocab} entries > max_vocab={max_vocab}; "
            "raise the bound or prune the tail with min_count "
            "(bounds the collect at total_tokens / min_count entries)"
        )
    weights = {r["word"]: r["weight"] for r in hist.collect()}
    learned = bpe_learn_merges(weights, n_merges)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(learned)],
        "step int, left string, right string, pair_count long",
    )


def bpe_apply_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment one word with an ordered BPE merge list: encode,
    apply each merge as a literal left-to-right replace (same greedy
    semantics as training), split back to subword tokens.

    ``merges`` is the MODEL — n_merges (l, r) pairs, driver-side by
    design like any model coefficients (cf. the LW length-weight
    a/b table): the whole application compiles to ONE nested string
    expression, so segmenting a 100 TB corpus is a zero-shuffle scan.
    """
    s, ss = BPE_SEP, BPE_SEP * 2
    enc = _bpe_encode(word)
    for l, r in merges:
        enc = F.replace(
            enc, F.lit(f"{s}{l}{ss}{r}{s}"), F.lit(f"{s}{l}{r}{s}")
        )
    return F.filter(F.split(enc, ss), lambda x: x != "")


def bpe_segmenter_arrow(merges: list[tuple[str, str]]):
    """Arrow-batched BPE segmenter for REALISTIC merge tables — the
    production apply path where :func:`bpe_apply_expr` caps out.

    The expr path replays every merge as a full string scan: O(n_merges
    × word length) per word, plus a nested-replace expression whose
    depth grows with the table — fine to a few hundred merges, hopeless
    at 32k.  This path does rank-based application (repeatedly merge
    the lowest-rank adjacent pair — dict lookups, independent of table
    size) inside a Pandas UDF with a per-batch memo on repeated words.

    Rank-based and sequential application coincide on any
    SELF-CONSISTENT learned table: a merge learned at step j can't
    contain a symbol first created at step k > j, so merging a later
    pair can never create an occurrence of an earlier one
    (parity-tested against the expr path).  Explicit opt-in backend,
    same policy as the cosine Arrow backend — registry oracle plans
    stay pure-JVM.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}

    def seg(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            best = None
            for a, b in zip(syms, syms[1:]):
                rk = ranks.get((a, b))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best = rk, (a, b)
            if best is None:
                break
            l, r = best
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def segment(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def memo(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = seg(w)
            return got

        return words.map(memo)

    return segment


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "lang",
    backend: str = "expr",
) -> DataFrame:
    """Tokens-per-word under a LEARNED BPE merge table, per group —
    the fertility audit run after tokenizer training (compare
    ``tokenizer_fertility``, which measures the regex pre-tokenizer).

    One explode + one aggregate; with ``backend="expr"`` (default, the
    oracle path) the segmentation is expression-only; ``"arrow"``
    dispatches to :func:`bpe_segmenter_arrow` for realistic merge
    tables (parity-tested).  Counts are integers, the ratio is a
    single division — engine-exact either way.
    """
    if backend == "expr":
        seg = F.size(bpe_apply_expr(F.col("word"), merges))
    elif backend == "arrow":
        seg = F.size(bpe_segmenter_arrow(merges)(F.col("word")))
    else:
        raise ValueError(f"unknown backend {backend!r}")
    words = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.select("grp", seg.alias("n_sub"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_subwords",
            F.round(F.col("n_subwords") / F.col("n_words"), 6).alias("fertility"),
        )
    )


def log2_nano_table(n: int) -> tuple[int, ...]:
    """``round(log2(c) * 1e9)`` for c in 1..n — the single source of
    truth for integer-argument log2 in nano-units.  Evaluated once in
    Python and embedded as a literal array in BOTH the Spark plan and
    the DuckDB oracle, so neither engine's libm is ever consulted at
    query time (1-ulp libm disagreements straddling the nano rounding
    boundary were an observed cross-engine hazard — see char_entropy)."""
    import math

    return tuple(round(math.log2(c) * 1e9) for c in range(1, n + 1))


_LOG2_LUT_SQL: dict = {}


def _log2_lut_col(n: int) -> Column:
    """:func:`log2_nano_table` as ONE parsed array<bigint> literal
    Column.  Only the SQL string is cached per table size; ``F.expr``
    runs per use (one round-trip) so no py4j-backed handle outlives
    its gateway (ADVICE r14)."""
    sql = _LOG2_LUT_SQL.get(n)
    if sql is None:
        vals = ",".join(f"{v}L" for v in log2_nano_table(n))
        sql = f"array({vals})"
        _LOG2_LUT_SQL[n] = sql
    return F.expr(sql)


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 512,
) -> DataFrame:
    """Per-document character-distribution Shannon entropy (bits) — a
    cheap repetitiveness/garbage signal: keyboard mash, base64 blobs
    and single-char runs sit far from natural text's ~4 bits/char, so
    entropy thresholds catch junk that length/stopword heuristics
    (c4_quality_filter) miss.

    Only the first ``max_chars`` characters are scored: entropy of a
    prefix converges fast, and the bound keeps the per-doc explode
    cost constant at corpus scale (a 1 MB doc costs the same 512 rows
    as a tweet).  Character extraction goes through
    ``substring(text, i, 1)`` over a position sequence — identical
    char-based (not byte) semantics on both engines.

    Exactness: ``H = log2(n) − (1/n)·Σ c·log2(c)`` — every transcendental
    argument is a small integer in [1, max_chars], so log2 is evaluated
    ONCE in Python into a shared nano-unit lookup table
    (:func:`log2_nano_table`) embedded as the SAME literal array in the
    Spark plan and the DuckDB oracle.  The per-doc sum and the
    numerator ``lut[n]·n − Σ c·lut[c]`` are pure BIGINT arithmetic
    (order-free, bounded by ~2^43 — exact in double for the final
    division).  The earlier formulation quantized ``−p·log2(p)`` per
    term with engine-local libm log2; a whole-registry sf0.1 gate run
    (round 7 session 3) caught 3/5000 docs where a 1-ulp libm
    disagreement straddled the nano rounding boundary — the LUT removes
    query-time transcendentals entirely, so no boundary exists to
    straddle.

    Returns (id, n_scored, n_distinct, entropy_bits).
    """
    lut = log2_nano_table(max_chars)
    prefix = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, max_chars).alias("_pfx"),
    ).filter(F.length("_pfx") > 0)
    # hash-partition the COMPACT prefix rows by doc id before the
    # explode (r14, guide §2.4): HashPartitioning(id) satisfies the
    # clustering requirement of BOTH downstream groupBys (id ⊆ each key
    # set), so the per-(id,char) count and the per-id rollup run
    # exchange-free — the plan's two post-explode agg exchanges become
    # this ONE exchange of ≤max_chars-byte prefix rows, and the explode
    # + count work is spread across every core instead of riding the
    # few-task scan.  Explicit partition count: AQE would coalesce the
    # tiny local frame back to one task.  Per-key work is bounded by
    # max_chars, so keying on the unique doc id cannot skew.
    prefix = prefix.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    chars = prefix.select(
        id_col,
        F.length("_pfx").alias("_n"),
        F.explode(F.sequence(F.lit(1), F.length("_pfx"))).alias("_i"),
        F.col("_pfx"),
    ).select(
        id_col, "_n", F.expr("substring(_pfx, _i, 1)").alias("_ch")
    )
    counts = chars.groupBy(id_col, "_n", "_ch").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # ONE cached expr() parse for the 512-long LUT literal: the per-
    # element lit+cast construction was ~1000 py4j round-trips of pure
    # driver time per query build (the _plane_weight_col pattern, r14);
    # parsed BIGINT literals hold the identical values
    lut_arr = _log2_lut_col(max_chars)
    term = F.col("_c") * F.element_at(lut_arr, F.col("_c").cast("int"))
    return (
        counts.select(id_col, "_n", "_c", term.alias("_t"))
        .groupBy(id_col, "_n")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("_t").alias("_s"),
        )
        .select(
            id_col,
            F.col("_n").alias("n_scored"),
            "n_distinct",
            F.round(
                (
                    F.element_at(lut_arr, F.col("_n").cast("int")) * F.col("_n")
                    - F.col("_s")
                ).cast("double")
                / (F.col("_n").cast("double") * F.lit(1e9)),
                6,
            ).alias("entropy_bits"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag of query terms
    (Robertson & Zaragoza 2009, the Lucene ``+1`` idf form so scores
    stay positive: ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``).

    The lexical complement to the ANN tiers: embedding search finds
    semantic neighbours, BM25 finds keyword matches — a retrieval
    pipeline needs both (hybrid search unions the two candidate sets).

    Scale shape: ZERO corpus shuffle.  For a query-sized term set the
    per-doc term frequencies come from array intrinsics
    (``size(filter(tokens, …))``) in the scan projection — no explode,
    no postings shuffle, no doc-length join (the naive
    explode → tf groupBy → dl join ships corpus-wide rows through two
    exchanges).  The corpus is scanned twice on pruned columns: once
    for the 1-row stats aggregate (df per term, avgdl, N — broadcast
    back), once for scoring; the global top-k is a TakeOrdered.
    Per-term contributions quantize to integer nano-units and sum in
    FIXED term order (engine-exact).

    Returns (id, n_terms_hit, score) — ties broken on the id.
    """
    from functools import reduce
    from operator import add

    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(text_col)
    def _is_term(term):
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _is_term(t))).alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    base = df.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    )
    stats = base.agg(
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
        F.count(F.lit(1)).cast("double").alias("_n"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    contribs, hits = [], []
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        dfreq = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        part = (
            tf
            * F.lit(k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
            )
        )
        contribs.append(
            F.when(tf > 0, F.floor(idf * part * F.lit(1e9)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        hits.append(F.when(tf > 0, 1).otherwise(0))
    score_q = reduce(add, contribs)
    n_hit = reduce(add, hits)
    return (
        scored.select(
            F.col(id_col),
            n_hit.cast("long").alias("n_terms_hit"),
            F.round(score_q / F.lit(1e9), 6).alias("score"),
        )
        .filter(F.col("n_terms_hit") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_topk_indexed(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k via an INVERTED-INDEX plan — the scale tier past the
    scan-local :func:`bm25_topk` crossover (SCALE.md): that tier costs
    one array scan per (doc, query term), so a 10k-term query multiset
    re-walks every document 10k times; this tier explodes the corpus
    to postings ONCE, keeps only rows whose term is in the (broadcast)
    query vocabulary, and scores from the postings table — cost
    proportional to matching postings, independent of query size.

    Exact-parity contract: the per-(doc, term) contribution is the
    SAME float expression on the same operands as ``bm25_topk``
    (idf · saturation, floored to nano-units), and nano-unit integers
    sum order-free — so both tiers hash-match the same DuckDB oracle
    (the bpe fast/slow cross-tier pattern).  Duplicate query terms
    contribute with multiplicity, exactly like the scan-local tier's
    one-column-per-term-instance expansion.

    Scale shape: one corpus scan for postings (explode + broadcast
    semi-filter on the query vocab — filter BEFORE the tf groupBy so
    only matching postings shuffle), one pruned-column scan for the
    1-row corpus stats, a vocab-sized df table broadcast back, and a
    TakeOrdered top-k.  The per-term df comes from groupBy + join-back
    (window-skew rule: query vocabs contain stopword-class hot terms).
    """
    spark = df.sparkSession
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    mult: dict[str, int] = {}
    for t in terms:
        mult[t] = mult.get(t, 0) + 1
    tframe = spark.createDataFrame(
        [(t, m) for t, m in sorted(mult.items())], "term string, _mult long"
    )
    toks = tokens(text_col)
    base = df.select(F.col(id_col), F.size(toks).alias("_dl"))
    stats = base.agg(
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    # postings feeds TWO consumers (document frequencies + scoring) —
    # the materialization rule: without a hard checkpoint each branch
    # re-explodes the whole corpus (two full tokenize scans + two tf
    # shuffles; observed in the plan).  The materialized frame is the
    # MATCHED postings only — bounded by query vocab × docs, far below
    # corpus size.
    postings = (
        df.select(F.col(id_col), F.size(toks).alias("_dl"),
                  F.explode(toks).alias("term"))
        .join(F.broadcast(tframe), "term")
        .groupBy(id_col, "term", "_dl", "_mult")
        .agg(F.count(F.lit(1)).alias("_tf"))
    ).localCheckpoint()
    return score_bm25_postings(postings, stats, k=k, k1=k1, b=b, id_col=id_col)


def score_bm25_postings(
    postings: DataFrame,
    stats: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """The shared BM25 scoring tail: ``postings`` holds the MATCHED
    (id, term, _tf, _dl, _mult) rows (query-vocab-bounded), ``stats``
    the 1-row (_n, _avgdl) corpus aggregate.  Used by
    :func:`bm25_topk_indexed` (postings built in-job) and by the
    persistent index tier (``operators/text_index.py`` — postings read
    bucket-pruned from a zone), so both tiers score with the IDENTICAL
    float expression and keep the cross-tier hash-parity contract.
    Per-term document frequencies come from the matched postings
    themselves (each row is a distinct (doc, term)), via groupBy +
    broadcast join-back — never a window.
    """
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    tf = F.col("_tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    part = (
        tf
        * F.lit(k1 + 1.0)
        / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
    )
    contrib = F.floor(idf * part * F.lit(1e9)).cast("long") * F.col("_mult")
    return (
        scored.select(F.col(id_col), F.col("_mult"), contrib.alias("_cq"))
        .groupBy(id_col)
        .agg(
            F.sum("_mult").alias("n_terms_hit"),
            F.round(F.sum("_cq") / F.lit(1e9), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Text normalization -- the canonical pre-dedup cleanup pass.


def normalize_whitespace_expr(col: str | Column) -> Column:
    """JVM-side text cleanup: strip C0 control characters and DEL
    (newline/tab first collapse into the whitespace run), squash every
    whitespace run -- including NBSP and the Unicode space block -- to
    one space, trim.  Running this before any digest/shingle pass
    stops formatting-only variants (CRLF vs LF, tab indents, trailing
    blanks) from splitting exact-dup groups.

    Pure ``regexp_replace`` chain -- codegen, no UDF, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_ctl = F.regexp_replace(
        c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", " "
    )
    return F.trim(
        F.regexp_replace(no_ctl, "[\\s\\u00A0\\u2000-\\u200B\\u3000]+", " ")
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFKC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) via an Arrow-batched
    pandas UDF -- Spark has no built-in normalizer, and byte-identical
    text is a precondition for exact dedup across sources that encode
    the same characters differently (composed vs combining accents,
    fullwidth forms, compatibility ligatures).

    The UDF is per-row-independent (``pandas_udf`` over string series,
    Arrow transfer, no state), so it rides inside the scan stage --
    no shuffle, parallel by partition.  This operator is deliberately
    OUTSIDE the oracle registry: normalization output depends on the
    Python runtime's Unicode tables, which is exactly the class of
    engine-local dependency the registry bans (see the char_entropy
    LUT precedent); its tests pin known codepoint fixtures instead.
    """
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    RefinedWeb/Dolma-style repetitiveness signal: boilerplate, keyword
    stuffing and template spam compress far below prose (~0.2 vs ~0.4+),
    catching duplication patterns n-gram heuristics miss (long-range
    repeats, near-repeats with character noise).

    An Arrow-batched ``pandas_udf`` (row-independent — rides in the
    scan stage, no shuffle, works unchanged on streams): DEFLATE needs
    real LZ77+Huffman state, not expressible as column expressions.
    Like ``normalize_unicode``, deliberately OUTSIDE the oracle
    registry — the exact ratio depends on the zlib build — with the
    level pinned so one deployment's scores are comparable across
    runs.  Empty/NULL text gets ratio 1.0 (incompressible by
    definition beats a NULL that would silently pass a `<` filter).
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 1.0
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, lvl)) / len(raw)

        return s.map(one, na_action=None).astype("float64")

    return df.withColumn(out_col, _ratio(F.col(text_col)))
