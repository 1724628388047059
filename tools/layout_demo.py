"""Layout-and-skipping demo: one zone written three ways — unclustered,
range-clustered on one key, Z-ordered on two keys — each carrying its
file-level skipping index, then a 2-D box predicate answered through
``read_pruned`` on all three.

    write:  lineitem → versioned zone ×3 (coalesce / range_by /
            compact_zone(zorder_by=…)), skipping_cols on every write
    query:  l_partkey ∈ [lo1, hi1] AND l_suppkey ∈ [lo2, hi2]
    check:  every pruned read ≡ the full-scan filter, row for row
    report: candidate files per layout + timings

Usage: python tools/layout_demo.py [sf_dir]   (default testdata/sf0.1)

The point on one screen: the SAME query touches every file of the
unclustered zone, the x-candidates of the range zone (which bound only
one dim), and a corner of the Z-ordered zone — file skipping is a
layout decision made at write time and a manifest read at query time
(SCALE.md "File skipping is a manifest read, not a footer walk").
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import parquet_io, skipping
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="layout_zones_")

    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    cols = ["l_partkey", "l_suppkey"]
    # query A hits the range layout's OWN sort dim; query B hits the
    # OTHER dim — the one a 1-D range cluster cannot bound at all
    queries = {
        "partkey range": {"l_partkey": (500, 1500)},
        "suppkey range": {"l_suppkey": (100, 150)},
    }

    t0 = time.time()
    plain = parquet_io.write_versioned(
        df.repartition(16), root, "plain", skipping_cols=cols
    )
    ranged = parquet_io.write_versioned(
        df, root, "ranged", range_by=["l_partkey"], n_files=16,
        skipping_cols=cols,
    )
    parquet_io.write_versioned(df.repartition(16), root, "zord")
    zord = parquet_io.compact_zone(
        spark, root, "zord", target_mb=1, zorder_by=cols, zorder_bits=8,
        skipping_cols=cols,
    )
    print(f"[write ] three layouts + skipping indexes in {time.time() - t0:.1f}s")

    for qname, box in queries.items():
        want = None
        for name, path in (
            ("plain", plain), ("ranged", ranged), ("zorder", zord),
        ):
            idx = skipping.read_skipping_index(spark, path).collect()
            by_file = {r.file: r.n_rows for r in idx}
            t0 = time.time()
            files = skipping.prune_files(spark, path, box)
            got = sorted(
                tuple(r)
                for r in skipping.read_pruned(spark, path, box).collect()
            )
            dt = time.time() - t0
            if want is None:
                full = spark.read.parquet(path)
                for c, (lo, hi) in box.items():
                    full = full.filter(F.col(c).between(lo, hi))
                want = sorted(tuple(r) for r in full.collect())
            assert got == want, f"{name}: pruned read drifted from the filter"
            scanned = sum(by_file[os.path.basename(f)] for f in files)
            total_rows = sum(by_file.values())
            print(
                f"[{qname}] {name:6s}: {len(files):3d}/{len(by_file):3d} "
                f"files, {scanned:7d}/{total_rows} rows scanned, "
                f"{len(got)} hits in {dt:.2f}s"
            )
    print("[check ] every pruned read identical to the full filter")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
