"""HTML → text extraction and link-graph extraction for crawled
corpora.

The WARC front door (``io/warc.py``) lands raw HTTP payloads; every
downstream text operator (quality gates, dedup, lang-id, packing)
assumes CLEAN text.  This module is the step between: tag/script/style
removal, entity decoding, whitespace normalization, title extraction,
and ``<a href>`` link extraction with relative-URL resolution — the
text half of what trafilatura/jusText do, re-expressed as pure JVM
``regexp_replace``/``regexp_extract_all`` chains so extraction is
scan-shaped: zero shuffles, zero Python, stream-safe, and fully
whole-stage-codegen (plan-asserted in ``tests/test_html.py``).

Engine-portability contract (what lets the oracle replay these): every
pattern avoids lookaround and backreferences, so the same regex means
the same thing to Java (Spark) and RE2 (DuckDB); replacements are
plain literals.  Block-level tags become newlines BEFORE the generic
tag strip so line-grain downstream signals (``scrub_boilerplate_lines``,
``segment_languages``, line-based quality ratios) see real document
structure, not one smashed line.

Known, documented limits (the price of the no-UDF scan shape):

* an unclosed ``<script>``/``<style>``/comment leaves its content as
  text (the non-greedy span never matches) — tolerable noise the
  quality gates downstream are built to catch;
* entity decoding covers the named core (&amp; &lt; &gt; &quot;
  &apos; &nbsp;) plus their common numeric forms; exotic numeric
  entities pass through as literal text;
* this extracts ALL text, not "main content" — boilerplate/nav chrome
  removal is a separate corpus-level pass the pipeline already has
  (``text.scrub_boilerplate_lines``, RefinedWeb line dedup), which is
  both more robust than per-page DOM heuristics and already
  hash-verified.

Links: ``extract_hrefs`` + ``resolve_url`` produce absolute URLs from
double- and single-quoted ``href`` attributes (protocol-relative,
root-relative and path-relative forms resolved against the page URL —
or a declared ``<base href>`` (:func:`base_href`);
``mailto:``/``javascript:``/fragment-only links dropped), feeding
``link_edges`` → ``host_link_graph`` — the host-level edge list that
drives crawl-frontier prioritization via the existing
``graph.pagerank``.  The rest of the crawl surface lives here too:
``extract_anchors`` (anchor-text harvest), ``parse_sitemap``
(urlset/sitemapindex → frontier rows; pair with
``web.robots_sitemaps``), and ``extract_meta`` (html lang /
description / rel=canonical / og:title page claims).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .web import host_of, registrable_domain

# Tags whose boundaries imply a line break in rendered text.  Both the
# opening and the closing form map to a newline; the whitespace
# normalizer collapses the doubles.
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|table|br|hr|blockquote|pre"
    "|section|article|aside|nav|header|footer|form|figure|figcaption"
    "|title|option|select|textarea"
)

# (pattern, replacement) chain applied by strip_html, in order.  Order
# matters twice: dotall spans (comments/script/style) go before any
# tag handling so their bodies never leak, and &amp; decodes LAST so a
# single-encoded document round-trips exactly (the standard one-level
# decode: '&amp;lt;' becomes '&lt;' the literal text, not '<').
_STRIP_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<script\b[^>]*>.*?</script>", ""),
    (r"(?is)<style\b[^>]*>.*?</style>", ""),
    (rf"(?is)</?({_BLOCK_TAGS})\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
)

# literal entity decode (F.replace, not regex): decode order is part of
# the contract — &amp;/&#38; strictly last.
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&#60;", "<"),
    ("&gt;", ">"),
    ("&#62;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
    ("&#38;", "&"),
)

# whitespace normalization chain: horizontal runs to one space, spaces
# hugging a newline dropped, newline runs to exactly one (every block
# boundary = one line break — downstream line-grain ops never see
# empty lines), then an anchored trim of outer whitespace.
_WS_CHAIN: tuple[tuple[str, str], ...] = (
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^[\s]+", ""),
    (r"[\s]+$", ""),
)


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decode_entities(text: str | Column) -> Column:
    """One-level HTML entity decode of the named core set (literal
    ``F.replace`` chain — no regex engine involved)."""
    out = _col(text)
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def normalize_ws(text: str | Column) -> Column:
    """Whitespace canonicalization shared by :func:`strip_html` and its
    oracle replay: horizontal runs → one space, newline-hugging spaces
    dropped, newline runs → one, outer whitespace trimmed."""
    out = _col(text)
    for pat, rep in _WS_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return out


def strip_html(html: str | Column) -> Column:
    """Rendered-text extraction as one scan-stage expression: comments,
    scripts and styles cut (dotall non-greedy spans), block-tag
    boundaries → newlines, remaining tags → spaces, entities decoded
    one level, whitespace normalized."""
    out = _col(html)
    for pat, rep in _STRIP_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return normalize_ws(decode_entities(out))


def text_density(html: str | Column) -> Column:
    """Rendered-text chars / raw markup chars, rounded to 6 dp — the
    cheap per-page main-content signal (trafilatura/jusText both gate
    on it): articles sit high, nav/boilerplate chrome pages sit low
    because their bytes are mostly tags and attributes.  One scan-side
    expression (reuses :func:`strip_html`), NULL on empty/NULL markup.
    """
    h = _col(html)
    raw = F.length(h)
    return F.when(raw > 0, F.round(F.length(strip_html(h)) / raw, 6))


def link_density(html: str | Column) -> Column:
    """Anchor-text chars / rendered-text chars, rounded to 6 dp —
    jusText's boilerplate discriminator: link farms and nav chrome
    have most of their visible text inside ``<a>`` (ratio → 1), body
    prose almost none.  Anchor inner markup is flattened with the same
    tag-strip + entity-decode + whitespace chain as the page text so
    the two lengths are commensurable.  NULL when the page renders no
    text at all."""
    h = _col(html)
    inner = F.regexp_extract_all(
        h, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1)
    )
    atext = normalize_ws(
        decode_entities(
            F.regexp_replace(F.array_join(inner, "\n"), r"(?is)<[^>]+>", " ")
        )
    )
    clean = F.length(strip_html(h))
    return F.when(clean > 0, F.round(F.length(atext) / clean, 6))


def page_quality_features(
    df: DataFrame,
    html_col: str = "text",
) -> DataFrame:
    """Append ``text_density`` and ``link_density`` columns computed
    from the RAW markup — call BEFORE :func:`extract_html_text`
    replaces the column with rendered text.  The two ratios ride into
    the extracted zone as page-level quality features next to the
    text-level ones (``text.quality_features``), giving downstream
    filters/classifiers the boilerplate signal without any per-page
    DOM work."""
    src = F.col(html_col)
    return df.withColumn("text_density", text_density(src)).withColumn(
        "link_density", link_density(src)
    )


def block_texts(html: str | Column) -> Column:
    """``array<struct<text, link_chars>>`` of rendered block texts —
    the page cut at block-tag boundaries (the same ``_BLOCK_TAGS`` set
    :func:`strip_html` maps to newlines), each fragment rendered with
    the identical tag-strip + entity-decode + whitespace chain, plus
    the fragment's anchor-text length.  Pure HOF expressions
    (``split``/``transform``/``filter``) — scan-shaped, no Python.

    Known limit (same class as the module's other regex bounds): an
    ``<a>`` wrapping a block tag is cut at the block boundary, so its
    text still renders but loses link attribution — conservative in
    the keep direction.
    """
    h = _col(html)
    for pat, rep in _STRIP_CHAIN[:3]:  # comments / scripts / styles
        h = F.regexp_replace(h, pat, rep)
    blocks = F.split(h, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>")

    def _render(b: Column) -> Column:
        return normalize_ws(
            decode_entities(F.regexp_replace(b, r"(?s)<[^>]*>", " "))
        )

    def _link_chars(b: Column) -> Column:
        inner = F.regexp_extract_all(
            b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1)
        )
        return F.length(
            normalize_ws(
                decode_entities(
                    F.regexp_replace(
                        F.array_join(inner, "\n"), r"(?s)<[^>]*>", " "
                    )
                )
            )
        )

    rendered = F.transform(
        blocks,
        lambda b: F.struct(
            _render(b).alias("text"), _link_chars(b).alias("link_chars")
        ),
    )
    return F.filter(rendered, lambda s: F.length(s["text"]) > 0)


def extract_main_content(
    df: DataFrame,
    html_col: str = "text",
    out_col: str = "main_text",
    max_link_density: float = 0.5,
    min_chars: int = 25,
) -> DataFrame:
    """Block-level boilerplate filter (jusText-lite; VERDICT r11
    Next #8): the page-level ``text_density``/``link_density`` signals
    applied PER BLOCK, so nav bars, link-farm footers and related-
    article rails drop while body prose survives — thresholds on the
    block, not the page, which is what separates main-content
    extraction from whole-page quality gating.

    A block is kept iff its rendered text has ``>= min_chars`` chars
    AND its anchor-text share is ``<= max_link_density`` (jusText's
    short/linky-block heuristic; defaults match its "good block"
    region).  Kept blocks re-join with newlines into ``out_col``.

    Scale shape: one scan, zero shuffles, zero Python — the whole
    chain is ``split``/``transform``/``filter``/``array_join`` HOF
    expressions, so it streams and pushes down exactly like
    :func:`extract_html_text` (plan-asserted in tests).  Use it as the
    feature-gated alternative to whole-page extraction; the corpus-
    level line scrub (``text.scrub_boilerplate_lines``) still applies
    downstream for cross-page chrome.
    """
    blocks = block_texts(F.col(html_col))
    kept = F.filter(
        blocks,
        lambda s: (F.length(s["text"]) >= min_chars)
        & (
            s["link_chars"]
            <= F.length(s["text"]) * F.lit(float(max_link_density))
        ),
    )
    main = F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
    return df.withColumn(out_col, main)


def html_title(html: str | Column) -> Column:
    """``<title>`` text (entity-decoded, whitespace-collapsed); NULL
    when the document has none."""
    raw = F.regexp_extract(_col(html), r"(?is)<title[^>]*>(.*?)</title>", 1)
    t = F.trim(F.regexp_replace(decode_entities(raw), r"\s+", " "))
    return F.when(t != "", t)


def extract_hrefs(html: str | Column) -> Column:
    """All ``<a ... href="...">`` values, double- then single-quoted,
    document order within each quote style (array<string>)."""
    h = _col(html)
    dq = F.regexp_extract_all(h, F.lit(r'(?is)<a\b[^>]*?href\s*=\s*"([^"]*)"'), F.lit(1))
    sq = F.regexp_extract_all(h, F.lit(r"(?is)<a\b[^>]*?href\s*=\s*'([^']*)'"), F.lit(1))
    return F.concat(dq, sq)


def resolve_url(href: str | Column, base_url: str | Column) -> Column:
    """Absolute http(s) URL for an href against its page URL; NULL for
    non-web schemes (mailto:, javascript:, tel:, data:), fragment-only
    and empty hrefs.  Fragments are cut first (a fragment never reaches
    the server).  Pure string expressions — resolution happens inside
    the extraction scan, nothing shuffles.

    RFC 3986 subset by design: no ``..`` segment normalization (a
    crawl frontier canonicalizes via ``web.canonical_url`` anyway) and
    base URLs are assumed absolute http(s) — what a crawler's frontier
    always has.
    """
    base = _col(base_url)
    h = F.regexp_extract(F.trim(_col(href)), r"^([^#]*)", 1)
    origin = F.regexp_extract(base, r"^(https?://[^/?#]+)", 1)
    scheme = F.regexp_extract(base, r"^(https?)", 1)
    path = F.regexp_extract(base, r"^https?://[^/?#]+([^?#]*)", 1)
    base_dir = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"[^/]*$", "")
    )
    return (
        F.when(h == "", F.lit(None).cast("string"))
        # scheme matching is case-insensitive per RFC 3986 §3.1
        # (HTTPS://X is absolute, not an unknown scheme); the host is
        # NOT lowercased here — web.canonical_url owns normalization
        .when(h.rlike(r"(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), F.lit(None).cast("string"))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(origin, base_dir, h))
    )


def _first_nonempty(*cols: Column) -> Column:
    """First non-empty extraction in order (regexp_extract yields ''
    on no match) — the quote-style/attribute-order fallback chain."""
    out = cols[-1]
    for c in reversed(cols[:-1]):
        out = F.when(c != "", c).otherwise(out)
    return out


def base_href(html: str | Column, page_url: str | Column) -> Column:
    """Effective resolution base for a page: the ``<base href>`` value
    when the document declares an absolute http(s) one, else the page
    URL.  (HTML allows a relative base href — resolving it needs the
    page URL anyway, so a relative base is resolved against the page
    URL first, matching browser behavior for the common cases.)"""
    b = _first_nonempty(
        F.regexp_extract(_col(html), r'(?is)<base\b[^>]*?href\s*=\s*"([^"]*)"', 1),
        F.regexp_extract(_col(html), r"(?is)<base\b[^>]*?href\s*=\s*'([^']*)'", 1),
    )
    return (
        F.when(b.rlike(r"^https?://"), b)
        .when(b != "", F.coalesce(resolve_url(b, _col(page_url)), _col(page_url)))
        .otherwise(_col(page_url))
    )


def extract_html_text(
    df: DataFrame,
    html_col: str = "text",
    out_col: str = "text",
    title_col: str = "title",
) -> DataFrame:
    """DataFrame wrapper: replace (or add) ``out_col`` with the
    extracted text and add the page title.  ``n_chars``, if present,
    is recomputed over the CLEAN text — every downstream length-based
    gate must see rendered-text length, not markup length."""
    src = F.col(html_col)
    out = df.withColumn(title_col, html_title(src)).withColumn(
        out_col, strip_html(src)
    )
    if "n_chars" in df.columns:
        out = out.withColumn("n_chars", F.length(out_col).cast("long"))
    return out


def link_edges(
    df: DataFrame,
    html_col: str = "text",
    url_col: str = "url",
    id_col: str = "doc_id",
    suffix_rules=None,
    honor_base_tag: bool = True,
) -> DataFrame:
    """One row per DISTINCT (document, resolved link): ``(id, url,
    link_url, src_host, dst_host, src_domain, dst_domain)``.

    Resolution runs inside the scan (``transform`` over the href
    array + null-filter), so the only shuffle is the per-doc distinct
    on (id, link) — and at 100 TB that shuffle moves (id, url) pairs,
    never document bodies.  ``suffix_rules`` switches registrable
    domains to the full PSL matcher (``web.registrable_domain_psl``).
    ``honor_base_tag`` resolves relative hrefs against a declared
    ``<base href>`` instead of the page URL (:func:`base_href`) —
    the src columns stay keyed to the PAGE's host regardless.
    """
    eff_base = (
        base_href(F.col(html_col), F.col(url_col))
        if honor_base_tag
        else F.col(url_col)
    )
    links = F.array_distinct(
        F.filter(
            F.transform(
                extract_hrefs(F.col(html_col)),
                lambda u: resolve_url(u, eff_base),
            ),
            lambda x: x.isNotNull(),
        )
    )
    exploded = df.select(
        F.col(id_col), F.col(url_col), F.explode(links).alias("link_url")
    )
    if suffix_rules is not None:
        from .web import registrable_domain_psl

        def _dom(c):
            return registrable_domain_psl(host_of(c), suffix_rules)

    else:

        def _dom(c):
            return registrable_domain(host_of(c))

    return exploded.select(
        id_col,
        url_col,
        "link_url",
        host_of(F.col(url_col)).alias("src_host"),
        host_of(F.col("link_url")).alias("dst_host"),
        _dom(F.col(url_col)).alias("src_domain"),
        _dom(F.col("link_url")).alias("dst_domain"),
    )


def host_link_graph(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    drop_self: bool = True,
) -> DataFrame:
    """Host-level edge list ``(src, dst, n_links)`` from
    :func:`link_edges` output — one groupBy on the natural (src, dst)
    key.  ``drop_self`` cuts intra-host navigation links (the bulk of
    any page's links and pure noise for cross-host authority); the
    result feeds ``graph.pagerank``/``graph.triangle_count`` directly
    for frontier prioritization."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if drop_self:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_links"))


def extract_anchors(
    df: DataFrame,
    html_col: str = "text",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Anchor-text harvest: one row per ``<a href>`` element with a
    resolvable target — ``(id, url, link_url, anchor)``, anchor being
    the element's rendered inner text (nested tags cut, entities
    decoded, whitespace collapsed).

    Anchor text describes the TARGET page, not the source — the
    classic crawl/search relevance signal and a weak-label source for
    training data (anchors pointing at a page summarize it).  Whole
    ``<a>…</a>`` elements come out of one ``regexp_extract_all``
    (group 0), then href and inner text are per-element expressions
    inside ``transform`` — everything stays in the scan; the only
    shuffle is the explode's downstream consumer's.

    Double-quoted hrefs only (the dominant form; ``link_edges`` covers
    both styles for pure connectivity) — documented trade so the
    element pattern stays in the Java/RE2 common subset.  Relative
    hrefs resolve against a declared ``<base href>`` when present
    (:func:`base_href`), else the page URL.
    """
    elem_pat = r'(?is)<a\b[^>]*?href\s*=\s*"[^"]*"[^>]*>.*?</a>'
    href_pat = r'(?is)href\s*=\s*"([^"]*)"'
    inner_pat = r"(?is)<a\b[^>]*>(.*)</a>"

    def _anchor(e: Column) -> Column:
        inner = F.regexp_extract(e, inner_pat, 1)
        txt = decode_entities(F.regexp_replace(inner, r"(?s)<[^>]*>", " "))
        return F.trim(F.regexp_replace(txt, r"\s+", " "))

    elems = F.regexp_extract_all(_col(html_col), F.lit(elem_pat), F.lit(0))
    pairs = F.filter(
        F.transform(
            elems,
            lambda e: F.struct(
                resolve_url(
                    F.regexp_extract(e, href_pat, 1),
                    base_href(_col(html_col), F.col(url_col)),
                ).alias(
                    "link_url"
                ),
                _anchor(e).alias("anchor"),
            ),
        ),
        lambda p: p["link_url"].isNotNull(),
    )
    return df.select(
        F.col(id_col), F.col(url_col), F.explode(pairs).alias("_p")
    ).select(id_col, url_col, F.col("_p.link_url"), F.col("_p.anchor"))


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "text",
    source_col: str | None = "url",
) -> DataFrame:
    """Sitemap XML → frontier rows: one row per ``<url>`` entry with
    ``(loc, lastmod, priority, kind)``; ``<sitemapindex>`` child
    sitemaps come out as ``kind='sitemap'`` rows so a crawler can
    fetch-and-recurse.  Feeds ``web.prioritize_frontier`` /
    ``web.fetch_schedule`` directly — sitemap seeding is the polite
    complement to link discovery.

    Same scan discipline as the rest of the module: ``<url>``/
    ``<sitemap>`` blocks via one ``regexp_extract_all`` each, per-block
    fields as ``transform`` expressions (loc entity-decoded — ``&`` in
    sitemap URLs is XML-escaped), ``try_cast`` on priority so a
    malformed value is NULL, never a failed scan.
    """

    def _entries(kind: str, block_pat: str) -> Column:
        blocks = F.regexp_extract_all(_col(xml_col), F.lit(block_pat), F.lit(1))
        return F.transform(
            blocks,
            lambda b: F.struct(
                decode_entities(
                    F.trim(F.regexp_extract(b, r"(?is)<loc[^>]*>\s*(.*?)\s*</loc>", 1))
                ).alias("loc"),
                F.nullif(
                    F.trim(
                        F.regexp_extract(
                            b, r"(?is)<lastmod[^>]*>\s*(.*?)\s*</lastmod>", 1
                        )
                    ),
                    F.lit(""),
                ).alias("lastmod"),
                F.trim(
                    F.regexp_extract(
                        b, r"(?is)<priority[^>]*>\s*(.*?)\s*</priority>", 1
                    )
                )
                .try_cast("double")
                .alias("priority"),
                F.lit(kind).alias("kind"),
            ),
        )

    both = F.concat(
        _entries("url", r"(?is)<url\b[^>]*>(.*?)</url>"),
        _entries("sitemap", r"(?is)<sitemap\b[^>]*>(.*?)</sitemap>"),
    )
    cols = [F.col(source_col)] if source_col else []
    return (
        df.select(*cols, F.explode(both).alias("_e"))
        .select(*([source_col] if source_col else []),
                F.col("_e.loc"), F.col("_e.lastmod"),
                F.col("_e.priority"), F.col("_e.kind"))
        .filter(F.col("loc") != "")
    )


def extract_meta(
    df: DataFrame,
    html_col: str = "text",
    url_col: str | None = None,
) -> DataFrame:
    """Page-metadata columns a curation pipeline wants alongside the
    text: ``html_lang`` (the ``<html lang>`` attribute — the
    publisher's own language claim, a strong PRIOR to reconcile with
    content lang-id), ``meta_description``, ``canonical_url`` (the
    ``<link rel=canonical>`` target, resolved against the page URL
    when ``url_col`` is given — feeds the URL-dedup front door as the
    publisher's OWN canonicalization), and ``og_title``.

    All four are ``regexp_extract`` fallback chains + entity decode
    (same scan-shape/portability contract as the rest of the module);
    empty extractions become NULL so downstream ``coalesce`` chains
    work.  Attribute ORDER (``name=… content=…`` and the reverse) and
    both quote styles are handled.
    """
    h = _col(html_col)

    def _clean(c: Column) -> Column:
        t = F.trim(F.regexp_replace(decode_entities(c), r"\s+", " "))
        return F.when(t != "", t)

    def _meta(attr: str, key: str) -> Column:
        pats = [
            rf'(?is)<meta\b[^>]*?{attr}\s*=\s*["\']{key}["\'][^>]*?content\s*=\s*"([^"]*)"',
            rf"(?is)<meta\b[^>]*?{attr}\s*=\s*[\"']{key}[\"'][^>]*?content\s*=\s*'([^']*)'",
            rf'(?is)<meta\b[^>]*?content\s*=\s*"([^"]*)"[^>]*?{attr}\s*=\s*["\']{key}["\']',
            rf"(?is)<meta\b[^>]*?content\s*=\s*'([^']*)'[^>]*?{attr}\s*=\s*[\"']{key}[\"']",
        ]
        return _clean(_first_nonempty(*(F.regexp_extract(h, p, 1) for p in pats)))

    lang = _first_nonempty(
        F.regexp_extract(h, r'(?is)<html\b[^>]*?lang\s*=\s*"([^"]*)"', 1),
        F.regexp_extract(h, r"(?is)<html\b[^>]*?lang\s*=\s*'([^']*)'", 1),
    )
    canon = _first_nonempty(
        F.regexp_extract(
            h,
            r'(?is)<link\b[^>]*?rel\s*=\s*["\']canonical["\'][^>]*?href\s*=\s*"([^"]*)"',
            1,
        ),
        F.regexp_extract(
            h,
            r"(?is)<link\b[^>]*?rel\s*=\s*[\"']canonical[\"'][^>]*?href\s*=\s*'([^']*)'",
            1,
        ),
    )
    canon_resolved = (
        resolve_url(canon, F.col(url_col)) if url_col else F.when(canon != "", canon)
    )
    return (
        df.withColumn("html_lang", _clean(F.lower(lang)))
        .withColumn("meta_description", _meta("name", "description"))
        .withColumn(
            "canonical_url", F.when(canon != "", canon_resolved)
        )
        .withColumn("og_title", _meta("property", "og:title"))
    )
