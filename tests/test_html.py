"""HTML → text extraction + link graph (operators/html.py).

Covers: tag/script/style/comment removal, block-tag newline structure,
entity decode (order + one-level contract), whitespace normalization,
title extraction, href extraction (both quote styles), relative URL
resolution against the page URL, per-doc edge rows and the host graph,
and the scan-shape contract (no Python eval, no shuffle in the
extraction plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import html as H

from conftest import rows


def _one(spark, html, expr):
    return spark.createDataFrame([(html,)], "h string").select(
        expr(F.col("h")).alias("v")
    ).first()["v"]


PAGE = (
    "<html><head><title> My &amp; Site </title>"
    "<style>p { color: red }</style></head>"
    "<body><!-- nav chrome -->"
    "<script type='text/javascript'>var x = '<p>not text</p>';</script>"
    "<h1>Head&#39;s up</h1>"
    "<p>First &lt;b&gt;paragraph&lt;/b&gt; &quot;quoted&quot;.</p>"
    "<div>Second   line<br>third&nbsp;line</div>"
    "<ul><li>a</li><li>b</li></ul>"
    "</body></html>"
)


class TestStripHtml:
    def test_full_page(self, spark):
        out = _one(spark, PAGE, H.strip_html)
        assert out == (
            "My & Site\n"
            "Head's up\n"
            'First <b>paragraph</b> "quoted".\n'
            "Second line\nthird line\n"
            "a\nb"
        )

    def test_script_style_comment_bodies_never_leak(self, spark):
        out = _one(spark, PAGE, H.strip_html)
        assert "not text" not in out
        assert "color" not in out
        assert "nav chrome" not in out

    def test_unclosed_script_leaves_content_as_text(self, spark):
        # documented limit: the non-greedy span needs the closing tag
        out = _one(spark, "<script>var x=1; <p>hi</p>", H.strip_html)
        assert "var x=1;" in out and "hi" in out

    def test_entity_decode_is_one_level(self, spark):
        # '&amp;lt;' is the ESCAPED text '&lt;' — decoding must yield
        # the literal string '&lt;', never '<'
        assert _one(spark, "&amp;lt;tag&amp;gt;", H.strip_html) == "&lt;tag&gt;"

    def test_numeric_core_entities(self, spark):
        assert _one(spark, "a&#60;b&#62;c&#34;d&#38;e", H.strip_html) == 'a<b>c"d&e'

    def test_whitespace_normalization(self, spark):
        got = _one(spark, "a \t  b\r\n\n\n\n c ", H.strip_html)
        assert got == "a b\nc"

    def test_plain_text_passthrough(self, spark):
        assert _one(spark, "no markup here", H.strip_html) == "no markup here"

    def test_block_tags_make_lines_inline_tags_do_not(self, spark):
        got = _one(spark, "<p>one</p><p>two <b>bold</b></p>", H.strip_html)
        assert got == "one\ntwo bold"


class TestTitle:
    def test_title(self, spark):
        assert _one(spark, PAGE, H.html_title) == "My & Site"

    def test_no_title_is_null(self, spark):
        assert _one(spark, "<p>x</p>", H.html_title) is None

    def test_multiline_title_collapses(self, spark):
        assert (
            _one(spark, "<title>a\n   b</title>", H.html_title) == "a b"
        )


LINKS_PAGE = (
    '<a href="https://other.example.net/page">abs</a>'
    '<a href="//cdn.example.net/x.js">proto-rel</a>'
    '<a href="/root/doc">root-rel</a>'
    '<a href="sibling.html">rel</a>'
    "<a href='sq.html'>single-quoted</a>"
    '<a href="#frag">frag-only</a>'
    '<a href="mailto:a@b.c">mail</a>'
    '<a href="javascript:void(0)">js</a>'
    '<a href="/root/doc">dup root-rel</a>'
)
BASE = "https://www.example.co.uk/dir/page.html?x=1"


class TestLinks:
    def test_extract_hrefs_both_quote_styles(self, spark):
        got = _one(spark, LINKS_PAGE, H.extract_hrefs)
        assert got[:4] == [
            "https://other.example.net/page",
            "//cdn.example.net/x.js",
            "/root/doc",
            "sibling.html",
        ]
        assert "sq.html" in got and len(got) == 9

    @pytest.mark.parametrize(
        "href,expect",
        [
            ("https://a.b/c", "https://a.b/c"),
            ("HTTPS://a.b/C", "HTTPS://a.b/C"),  # scheme case-insensitive
            ("http://a.b/c?q=1", "http://a.b/c?q=1"),
            ("//cdn.a.b/x", "https://cdn.a.b/x"),
            ("/top", "https://www.example.co.uk/top"),
            ("sib.html", "https://www.example.co.uk/dir/sib.html"),
            ("a/b.html", "https://www.example.co.uk/dir/a/b.html"),
            ("sib.html#sec", "https://www.example.co.uk/dir/sib.html"),
            ("#frag", None),
            ("", None),
            ("mailto:a@b.c", None),
            ("javascript:void(0)", None),
            ("tel:+1-555", None),
        ],
    )
    def test_resolve_url(self, spark, href, expect):
        got = (
            spark.createDataFrame([(href, BASE)], "h string, b string")
            .select(H.resolve_url("h", "b").alias("v"))
            .first()["v"]
        )
        assert got == expect

    def test_resolve_against_bare_origin(self, spark):
        got = (
            spark.createDataFrame(
                [("rel.html", "https://example.com")], "h string, b string"
            )
            .select(H.resolve_url("h", "b").alias("v"))
            .first()["v"]
        )
        assert got == "https://example.com/rel.html"

    def test_link_edges(self, spark):
        df = spark.createDataFrame(
            [(1, BASE, LINKS_PAGE)], "doc_id long, url string, text string"
        )
        got = rows(H.link_edges(df), "doc_id", "link_url", "dst_domain")
        urls = [g[1] for g in got]
        # 5 distinct resolved links (dup root-rel collapsed; frag,
        # mailto and javascript dropped)
        assert len(urls) == 5
        assert "https://www.example.co.uk/root/doc" in urls
        assert ("https://cdn.example.net/x.js") in urls
        doms = {g[2] for g in got}
        assert "example.net" in doms and "example.co.uk" in doms

    def test_host_link_graph(self, spark):
        df = spark.createDataFrame(
            [
                (1, "https://a.com/p", '<a href="https://b.com/x">.</a><a href="/self">.</a>'),
                (2, "https://a.com/q", '<a href="https://b.com/y">.</a>'),
                (3, "https://b.com/r", '<a href="https://a.com/z">.</a>'),
            ],
            "doc_id long, url string, text string",
        )
        g = rows(H.host_link_graph(H.link_edges(df)), "src", "dst", "n_links")
        assert g == [("a.com", "b.com", 2), ("b.com", "a.com", 1)]

    def test_self_links_kept_when_asked(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/p", '<a href="/self">.</a>')],
            "doc_id long, url string, text string",
        )
        g = rows(
            H.host_link_graph(H.link_edges(df), drop_self=False),
            "src", "dst", "n_links",
        )
        assert g == [("a.com", "a.com", 1)]


class TestDataFrameOpsAndPlan:
    def test_extract_html_text_recomputes_n_chars(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>hi</p>", 999)], "doc_id long, text string, n_chars long"
        )
        out = H.extract_html_text(df).first()
        assert out["text"] == "hi" and out["n_chars"] == 2
        assert out["title"] is None

    def test_extraction_plan_is_scan_shaped(self, spark):
        df = spark.createDataFrame(
            [(1, PAGE, BASE)], "doc_id long, text string, url string"
        )
        plan = (
            H.extract_html_text(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "extraction must not shuffle"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_link_edges_single_shuffle(self, spark):
        df = spark.createDataFrame(
            [(1, BASE, LINKS_PAGE)], "doc_id long, url string, text string"
        )
        plan = (
            H.link_edges(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


SITEMAP = (
    '<?xml version="1.0"?>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
    "<lastmod>2026-01-05</lastmod><priority>0.8</priority></url>"
    "<url><loc>https://a.com/q</loc><priority>bogus</priority></url>"
    "</urlset>"
)
SITEMAP_INDEX = (
    "<sitemapindex><sitemap><loc>https://a.com/sitemap1.xml</loc>"
    "<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"
)


class TestSitemap:
    def test_urlset_entries(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/sitemap.xml", SITEMAP)], "url string, text string"
        )
        got = rows(
            H.parse_sitemap(df), "loc", "lastmod", "priority", "kind"
        )
        assert got == [
            ("https://a.com/p?x=1&y=2", "2026-01-05", 0.8, "url"),
            ("https://a.com/q", None, None, "url"),
        ]

    def test_index_recursion_rows(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/sitemap.xml", SITEMAP_INDEX)],
            "url string, text string",
        )
        got = rows(H.parse_sitemap(df), "loc", "lastmod", "kind")
        assert got == [("https://a.com/sitemap1.xml", "2026-02-01", "sitemap")]

    def test_feeds_fetch_schedule(self, spark):
        from peskas_mozambique_data_pipeline_spark.operators import web

        df = spark.createDataFrame(
            [("https://a.com/sitemap.xml", SITEMAP)], "url string, text string"
        )
        frontier = H.parse_sitemap(df).select(F.col("loc").alias("url"))
        delays = spark.createDataFrame(
            [("a.com", 1000)], "host string, crawl_delay_ms long"
        )
        sched = rows(web.fetch_schedule(frontier, delays), "url", "fetch_offset_ms")
        assert [s[1] for s in sched] == [0, 1000]


class TestAnchors:
    def test_anchor_text_harvest(self, spark):
        page = (
            '<a href="https://b.com/x" class="z">Great <b>resource</b>&nbsp;here</a>'
            '<a href="/local">  spaced   anchor </a>'
            '<a href="mailto:x@y">dropped</a>'
            '<a href="https://c.com/y"><img src="i.png"></a>'
        )
        df = spark.createDataFrame(
            [(1, "https://a.com/p", page)], "doc_id long, url string, text string"
        )
        got = rows(H.extract_anchors(df), "link_url", "anchor")
        assert got == [
            ("https://a.com/local", "spaced anchor"),
            ("https://b.com/x", "Great resource here"),
            ("https://c.com/y", ""),
        ]

    def test_anchors_plan_no_python(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/p", '<a href="/x">t</a>')],
            "doc_id long, url string, text string",
        )
        plan = (
            H.extract_anchors(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestBaseTag:
    BASED = (
        '<base href="https://cdn.example.org/assets/">'
        '<a href="img/x.html">rel</a><a href="/root">rooted</a>'
    )

    def test_base_tag_changes_relative_resolution(self, spark):
        df = spark.createDataFrame(
            [(1, "https://page.example.com/dir/p.html", self.BASED)],
            "doc_id long, url string, text string",
        )
        got = rows(H.link_edges(df), "link_url", "src_host")
        urls = [g[0] for g in got]
        assert "https://cdn.example.org/assets/img/x.html" in urls
        assert "https://cdn.example.org/root" in urls
        # src stays keyed to the PAGE host, not the base host
        assert all(g[1] == "page.example.com" for g in got)

    def test_base_tag_can_be_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, "https://page.example.com/dir/p.html", self.BASED)],
            "doc_id long, url string, text string",
        )
        urls = [g[0] for g in rows(H.link_edges(df, honor_base_tag=False), "link_url")]
        assert "https://page.example.com/dir/img/x.html" in urls

    def test_relative_base_resolves_against_page(self, spark):
        got = (
            spark.createDataFrame(
                [('<base href="sub/">x', "https://a.com/dir/p.html")],
                "h string, u string",
            )
            .select(H.base_href("h", "u").alias("v"))
            .first()["v"]
        )
        assert got == "https://a.com/dir/sub/"

    def test_no_base_falls_back_to_page_url(self, spark):
        got = (
            spark.createDataFrame(
                [("<p>no base</p>", "https://a.com/p")], "h string, u string"
            )
            .select(H.base_href("h", "u").alias("v"))
            .first()["v"]
        )
        assert got == "https://a.com/p"

    def test_anchor_resolution_honors_base(self, spark):
        df = spark.createDataFrame(
            [(1, "https://page.example.com/p", self.BASED)],
            "doc_id long, url string, text string",
        )
        urls = {r["link_url"] for r in H.extract_anchors(df).collect()}
        assert "https://cdn.example.org/assets/img/x.html" in urls


class TestMeta:
    META_PAGE = (
        '<html lang="EN-us"><head>'
        '<meta name="description" content="A &amp; B page">'
        '<meta content="OG Title" property="og:title">'
        '<link rel="canonical" href="/canon/page">'
        "</head><body>x</body></html>"
    )

    def test_extract_meta_fields(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/dir/p?utm=1", self.META_PAGE)],
            "doc_id long, url string, text string",
        )
        got = H.extract_meta(df, url_col="url").first()
        assert got["html_lang"] == "en-us"
        assert got["meta_description"] == "A & B page"
        assert got["og_title"] == "OG Title"     # reversed attr order
        assert got["canonical_url"] == "https://a.com/canon/page"

    def test_missing_meta_is_null(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>bare</p>")], "doc_id long, text string"
        )
        got = H.extract_meta(df).first()
        assert got["html_lang"] is None
        assert got["meta_description"] is None
        assert got["canonical_url"] is None
        assert got["og_title"] is None

    def test_unresolved_canonical_without_url(self, spark):
        df = spark.createDataFrame(
            [(1, '<link rel="canonical" href="https://a.com/c">')],
            "doc_id long, text string",
        )
        assert H.extract_meta(df).first()["canonical_url"] == "https://a.com/c"

    def test_single_quoted_meta_and_base(self, spark):
        page = (
            "<html lang='fr'><head>"
            "<meta name='description' content='Desc SQ'>"
            "<link rel='canonical' href='/c'>"
            "<base href='https://b.org/d/'></head>"
            "<body><a href=\"x.html\">t</a></body></html>"
        )
        df = spark.createDataFrame(
            [(1, "https://a.com/p", page)], "doc_id long, url string, text string"
        )
        got = H.extract_meta(df, url_col="url").first()
        assert got["html_lang"] == "fr"
        assert got["meta_description"] == "Desc SQ"
        assert got["canonical_url"] == "https://a.com/c"
        links = [r["link_url"] for r in H.link_edges(df).collect()]
        assert links == ["https://b.org/d/x.html"]


class TestDensityFeatures:
    ARTICLE = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Deep sea fishing</h1>"
        "<p>Fishing effort in the northern districts rose steadily over "
        "the last decade, driven by motorized vessels and new landing "
        "sites along the coast. Catch composition shifted toward small "
        "pelagics as reef stocks declined.</p>"
        "<p>Management responses included seasonal closures and gear "
        "restrictions, with mixed compliance across communities.</p>"
        "<a href=\"/more\">Read more</a></body></html>"
    )
    NAVPAGE = (
        "<html><head><title>Nav</title></head><body><ul>"
        + "".join(
            f'<li class="nav-item menu"><a href="/s/{i}" rel="nofollow">'
            f"Section {i}</a></li>"
            for i in range(12)
        )
        + "</ul></body></html>"
    )

    def test_article_vs_navpage_separation(self, spark):
        df = spark.createDataFrame(
            [(1, self.ARTICLE), (2, self.NAVPAGE)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in H.page_quality_features(df).collect()}
        # the article's bytes are mostly prose; the nav page's are
        # mostly tags/attributes
        assert got[1].text_density > 2 * got[2].text_density
        # nearly all the nav page's visible text is anchor text; the
        # article's is almost none
        assert got[2].link_density > 0.8
        assert got[1].link_density < 0.1

    def test_exact_ratios_on_tiny_page(self, spark):
        page = "<p>ab cd</p><a href='/x'>ef</a>"
        df = spark.createDataFrame([(1, page)], "doc_id long, text string")
        r = H.page_quality_features(df).first()
        # rendered text: "ab cd\nef" (block p -> newline boundaries,
        # inline a flattened) = 8 chars; anchor text "ef" = 2
        rendered = len("ab cd\nef")
        assert r.text_density == round(rendered / len(page), 6)
        assert r.link_density == round(2 / rendered, 6)

    def test_null_and_empty_markup(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "<style>p{}</style>")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in H.page_quality_features(df).collect()}
        assert got[1].text_density is None and got[1].link_density is None
        assert got[2].text_density is None and got[2].link_density is None
        # renders no text: density 0, link ratio undefined
        assert got[3].text_density == 0.0
        assert got[3].link_density is None

    def test_densities_are_scan_side_no_python(self, spark):
        df = spark.createDataFrame([(1, self.ARTICLE)], "doc_id long, text string")
        plan = (
            H.page_quality_features(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


class TestMainContent:
    CHROME_PAGE = (
        "<html><head><title>T</title><script>var x=1;</script></head>"
        "<body>"
        "<ul>"
        + "".join(
            f'<li class="nav"><a href="/s/{i}">Section {i}</a></li>'
            for i in range(12)
        )
        + "</ul>"
        "<p>Fishing effort in the northern districts rose steadily over "
        "the last decade, driven by motorized vessels and new landing "
        "sites along the coast.</p>"
        "<p>Catch composition shifted toward small pelagics as reef "
        "stocks declined, see <a href=\"/ref\">the annex</a> for "
        "details on species-level trends.</p>"
        "<div>ok</div>"
        "<div class=\"footer\">"
        + "".join(f'<a href="/f/{i}">Footer link {i}</a> ' for i in range(8))
        + "</div></body></html>"
    )

    def test_blocks_drop_nav_and_footer_keep_prose(self, spark):
        df = spark.createDataFrame(
            [(1, self.CHROME_PAGE)], "doc_id long, text string"
        )
        main = H.extract_main_content(df).first().main_text
        assert "Fishing effort in the northern districts" in main
        assert "species-level trends" in main  # prose with an inline link kept
        assert "Section 3" not in main  # nav chrome dropped
        assert "Footer link" not in main  # link farm dropped
        assert "ok" not in main.split("\n")  # sub-min_chars junk dropped
        assert "var x=1" not in main

    def test_retention_delta_vs_whole_page(self, spark):
        """The measured point of the block filter: on a chrome-heavy
        page it keeps the prose but sheds most boilerplate chars."""
        df = spark.createDataFrame(
            [(1, self.CHROME_PAGE)], "doc_id long, text string"
        )
        whole = df.select(H.strip_html("text").alias("t")).first().t
        main = H.extract_main_content(df).first().main_text
        prose_chars = len(main)
        assert 0.3 < prose_chars / len(whole) < 0.8  # real reduction
        # everything kept is prose: both paragraphs survive verbatim
        assert main.count("\n") == 1

    def test_thresholds_are_dials(self, spark):
        df = spark.createDataFrame(
            [(1, self.CHROME_PAGE)], "doc_id long, text string"
        )
        # loosening the dials converges back to whole-page text
        loose = H.extract_main_content(
            df, max_link_density=1.0, min_chars=1
        ).first().main_text
        assert "Section 3" in loose and "ok" in loose.split("\n")

    def test_main_content_stays_jvm_side(self, spark):
        df = spark.createDataFrame(
            [(1, self.CHROME_PAGE)], "doc_id long, text string"
        )
        out = H.extract_main_content(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert out.first().main_text  # and it actually renders
