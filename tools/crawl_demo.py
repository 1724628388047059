"""Crawl-loop demo: WARC bytes → HTML extraction → curation DAG front
door, plus the full polite-discovery loop over the same archive —

    WARC ingest → extract_html → (normalize → url_dedup → quality →
    dedup → pack)                                    [content path]
    robots.txt → rules + Sitemap: directives → parse_sitemap →
    link_edges → host_link_graph → pagerank →
    prioritize_frontier → fetch_schedule             [frontier path]

Usage: python tools/crawl_demo.py [n_sites]   (default 6)

Synthesizes a member-gzip WARC of interlinked HTML sites (every site
links its hub; one "hub" site is linked by all), each with a
robots.txt carrying a Crawl-delay and a Sitemap directive, and a
sitemap.xml naming the next frontier URLs.  Prints zone counts, the
pagerank order (the hub must rank first), and the head of the
politeness-scheduled frontier.  Everything distributed: the demo
collects only host-grained tables and the printed heads.
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import graph, html, web
from peskas_mozambique_data_pipeline_spark.plans import corpus
from peskas_mozambique_data_pipeline_spark.session import get_spark


def _record(warc_type: str, payload: bytes, **headers: str) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {warc_type}",
            f"Content-Length: {len(payload)}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _site_page(i: int, n: int) -> bytes:
    hub = "hub.example.org"
    para = (
        f"Site {i} publishes a genuinely informative paragraph with "
        "plenty of distinct words and proper sentences that ends "
        "correctly and keeps the quality heuristics satisfied. " * 6
    )
    links = f'<a href="https://{hub}/home">the hub</a>'
    links += f'<a href="/local/{i}">self</a>'
    links += f'<a href="https://s{(i + 1) % n}.example.org/peer">peer</a>'
    page = (
        f"<html><head><title>Site {i} &amp; Co</title>"
        "<script>var t = 'tracking';</script></head>"
        f"<body><h1>Site {i}</h1><p>{para}</p>{links}</body></html>"
    )
    return page.encode()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="crawl_demo_")
    t0 = time.time()
    try:
        # --- synthesize the archive -------------------------------------
        recs = [_record("warcinfo", b"software: crawl_demo\r\n")]
        hub_para = (
            "The hub aggregates genuinely informative paragraphs with "
            "plenty of distinct words in proper sentences ending well. " * 6
        )
        hub_page = (
            "<html><head><title>Hub</title></head><body><h1>Hub</h1>"
            f"<p>{hub_para}</p>"
            + "".join(
                f'<a href="https://s{i}.example.org/page">site {i}</a>'
                for i in range(n)
            )
            + "</body></html>"
        ).encode()
        recs.append(_record(
            "response", _http(hub_page),
            **{"WARC-Target-URI": "https://hub.example.org/home"},
        ))
        for i in range(n):
            recs.append(_record(
                "response", _http(_site_page(i, n)),
                **{"WARC-Target-URI": f"https://s{i}.example.org/page"},
            ))
        warc_path = os.path.join(tmp, "crawl.warc.gz")
        with open(warc_path, "wb") as f:
            for r in recs:
                f.write(gzip.compress(r))

        # --- content path: WARC → extract_html → curation DAG ----------
        zones = os.path.join(tmp, "zones")
        out = corpus.run_corpus_pipeline(
            spark, None, zones, budget=4096, jaccard_threshold=0.5,
            warc_path=warc_path, extract_html=True,
        )
        for z in ("corpus_ingested", "corpus_extracted", "corpus_filtered",
                  "corpus_deduped", "corpus_packs"):
            if z in out:
                print(f"{z:<18}", spark.read.parquet(out[z]).count())

        # --- main-content extraction: block-level boilerplate filter ----
        # retention delta vs whole-page extraction on the same markup
        # (the hub page is chrome-heavy: its link list drops, the prose
        # paragraph survives)
        ingested = spark.read.parquet(out["corpus_ingested"])
        dens = html.extract_main_content(ingested, html_col="text").select(
            "url",
            F.length(html.strip_html("text")).alias("whole_chars"),
            F.length("main_text").alias("main_chars"),
        )
        ret = dens.agg(
            F.sum("whole_chars").alias("w"), F.sum("main_chars").alias("m")
        ).first()
        hub = dens.filter(F.col("url").contains("hub")).first()
        print(
            f"main-content retention: {ret.m}/{ret.w} chars "
            f"({ret.m / ret.w:.1%}); hub page "
            f"{hub.main_chars}/{hub.whole_chars} "
            f"({hub.main_chars / hub.whole_chars:.1%} — nav chrome shed)"
        )
        assert hub.main_chars < hub.whole_chars

        # --- frontier path: links + robots + sitemaps -------------------
        # links come from the ingested MARKUP (the extracted zone holds
        # clean text by design)
        edges = html.link_edges(ingested, html_col="text", url_col="url")
        hg = html.host_link_graph(edges)
        sym = hg.select("src", "dst").unionByName(
            hg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        ranks = graph.pagerank(sym, n_iters=3)
        top = ranks.orderBy(F.desc("rank")).limit(3).collect()
        print("pagerank head:", [(r["node"], round(r["rank"], 4)) for r in top])
        assert top[0]["node"] == "hub.example.org", "hub must rank first"

        # connectivity gate: k-core of the host graph.  This fixture is
        # a hub + peer ring (every spoke links hub/prev/next → degree
        # 3), so the 2-core keeps the whole mesh — and the 4-core peels
        # it entirely (spokes fall, the hub's support falls with them):
        # the two ends of the gate, both asserted
        n_hosts = sym.select(F.col("src").alias("n")).distinct().count()
        core2 = graph.kcore(hg, 2, a_col="src", b_col="dst").count()
        core4 = graph.kcore(hg, 4, a_col="src", b_col="dst").count()
        print(f"link-graph core gate: 2-core {core2}/{n_hosts} hosts "
              f"(mutually-linked mesh), 4-core {core4}/{n_hosts} "
              "(no dense nucleus)")
        assert core2 == n_hosts and core4 == 0

        robots = spark.createDataFrame(
            [(f"s{i}.example.org",
              "User-agent: *\nDisallow: /private/\n"
              f"Crawl-delay: {1 + i % 3}\n"
              f"Sitemap: https://s{i}.example.org/sitemap.xml\n")
             for i in range(n)],
            "host string, robots_txt string",
        )
        sitemap_urls = web.robots_sitemaps(robots)
        print("sitemap directives:", sitemap_urls.count())

        sitemap_bodies = sitemap_urls.select(
            F.col("sitemap_url").alias("url"),
            F.concat(
                F.lit("<urlset><url><loc>https://"), F.col("host"),
                F.lit("/new/a</loc></url><url><loc>https://"), F.col("host"),
                F.lit("/new/b</loc></url></urlset>"),
            ).alias("text"),
        )
        frontier = html.parse_sitemap(sitemap_bodies).select(
            F.col("loc").alias("url")
        )
        pri = web.prioritize_frontier(frontier, ranks)
        delays = web.parse_crawl_delays(robots)
        sched = web.fetch_schedule(pri, delays)
        head = sched.orderBy(
            F.desc("host_rank"), "fetch_offset_ms", "url"
        ).limit(4).collect()
        print("frontier head:")
        for r in head:
            print(f"  {r['url']}  rank={r['host_rank']:.4f} "
                  f"offset={r['fetch_offset_ms']}ms")
        n_frontier = sched.count()
        assert n_frontier == 2 * n, (n_frontier, n)
        print(f"frontier scheduled: {n_frontier} URLs "
              f"({time.time() - t0:.1f}s total)")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
