"""Corpus datacard: the release-summary artifact a dataset ships with
(datasheet/data-card practice, Gebru et al. 2021) — composed entirely
from the repo's oracle-verified operators, printed as markdown.

Sections: per-(source, lang) volume; token-length distribution (exact
quantiles); heuristic-quality pass rate + mean quality score; lang-id
agreement with the labeled language; exact-duplicate rate; character
entropy distribution (junk signal).

Every number comes from an AGGREGATE (bounded collect — group counts,
quantile arrays, one distribution row); document text never reaches
the driver.  At 100 TB each section is one or two shuffles on low-
cardinality keys.

Usage: python tools/datacard.py [sf_dir] (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import dedup as dedup_ops
from peskas_mozambique_data_pipeline_spark.operators import text as text_ops
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")

    print(f"# Corpus datacard — {sf_dir}\n")

    # volume by source × lang (one groupBy)
    vol = (
        docs.select(
            "source", "lang",
            text_ops.token_count("text").cast("long").alias("_tok"),
            "n_chars",
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_tok").alias("tokens"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("source", "lang")
        .collect()
    )
    total_docs = sum(r["docs"] for r in vol)
    total_tokens = sum(r["tokens"] for r in vol)
    print(f"**{total_docs:,} documents · {total_tokens:,} whitespace tokens**\n")
    print("## Volume\n\n| source | lang | docs | tokens | chars |")
    print("|---|---|---:|---:|---:|")
    for r in vol:
        print(f"| {r['source']} | {r['lang']} | {r['docs']:,} "
              f"| {r['tokens']:,} | {r['chars']:,} |")

    # token-length distribution (exact quantiles — one aggregate)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    lens = docs.select(text_ops.token_count("text").alias("n")).agg(
        *[F.expr(f"percentile(n, {q})").alias(f"p{int(q * 100)}") for q in qs],
        F.min("n").alias("min"), F.max("n").alias("max"),
    ).first()
    print("\n## Token length\n\n| min | p1 | p10 | p25 | p50 | p75 | p90 | p99 | max |")
    print("|---:|---:|---:|---:|---:|---:|---:|---:|---:|")
    print("| " + " | ".join(
        str(int(lens[c])) for c in ["min", "p1", "p10", "p25", "p50", "p75", "p90", "p99", "max"]
    ) + " |")

    # quality + lang-id agreement (scan + one distribution row)
    feat = text_ops.language_id(text_ops.quality_features(docs))
    quality = feat.agg(
        F.round(F.avg("quality_score"), 4).alias("mean_quality"),
        F.round(
            F.avg(text_ops.c4_keep_expr("text").cast("double")), 4
        ).alias("c4_pass_rate"),
        F.round(
            F.avg((F.col("pred_lang") == F.col("lang")).cast("double")), 4
        ).alias("langid_agreement"),
    ).first()
    print(f"\n## Quality\n")
    print(f"- mean heuristic quality score: **{quality['mean_quality']}**")
    print(f"- C4/Gopher gate pass rate: **{quality['c4_pass_rate']:.1%}**")
    print(f"- lang-id agreement with labels: **{quality['langid_agreement']:.1%}**")

    # exact duplicates (one digest groupBy)
    dup_stats = dedup_ops.exact_dup_groups(docs).agg(
        F.count(F.lit(1)).alias("groups"),
        F.coalesce(F.sum(F.col("group_size") - 1), F.lit(0)).alias("redundant"),
    ).first()
    rate = (dup_stats["redundant"] or 0) / total_docs if total_docs else 0.0
    print(f"\n## Exact duplication\n")
    print(f"- duplicate groups: **{dup_stats['groups']}**, redundant copies: "
          f"**{dup_stats['redundant']}** ({rate:.2%} of corpus)")

    # entropy distribution (junk/garbage signal)
    ent = text_ops.char_entropy(docs).agg(
        F.round(F.expr("percentile(entropy_bits, 0.05)"), 3).alias("p5"),
        F.round(F.expr("percentile(entropy_bits, 0.5)"), 3).alias("p50"),
        F.round(F.expr("percentile(entropy_bits, 0.95)"), 3).alias("p95"),
    ).first()
    print(f"\n## Character entropy (bits)\n")
    print(f"- p5 {ent['p5']} · p50 {ent['p50']} · p95 {ent['p95']} "
          f"(natural text ≈ 4; low = repetitive/junk, high = encoded blobs)")

    # re-identification risk over the release's linkable metadata
    # (operators/privacy.py — one shuffle on the QI key; class counts
    # only, never document text)
    from peskas_mozambique_data_pipeline_spark.operators import (
        privacy as pv,
    )

    k = 5
    rep = pv.k_anonymity_report(docs, ["source", "lang"], k).first()
    print(f"\n## Re-identification risk (QI = source × lang)\n")
    print(
        f"- k = **{rep.min_class_size}** over {rep.n_classes} classes "
        f"(gate: k ≥ {k}); {rep.n_risky_rows}/{rep.n_rows} rows in "
        f"{rep.n_risky_classes} under-threshold classes"
    )
    verdict = "PASS" if rep.min_class_size >= k else (
        "SUPPRESS before release (suppress_rare_groups) or coarsen the "
        "QI (generalize)"
    )
    print(f"- verdict: **{verdict}**")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
