"""Manifest-backed data-skipping index (io/skipping.py): index truth
vs parquet footers, pruned-read exactness, z-order pairing, null
semantics, and the empty-candidate path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import skipping
from peskas_mozambique_data_pipeline_spark.operators import layout


def _grid(spark, n=4096):
    rows = [(i, i % 64, i // 64) for i in range(n)]
    return rows, spark.createDataFrame(rows, "id long, x long, y long")


def test_index_matches_parquet_footers(spark, tmp_path):
    import pyarrow.parquet as pq

    _, df = _grid(spark)
    path = str(tmp_path / "zone")
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(path)
    skipping.write_skipping_index(spark, path, ["x", "y"])
    idx = {
        r.file: r for r in skipping.read_skipping_index(spark, path).collect()
    }
    n_files = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        n_files += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in ("x", "y"):
            mins = [
                md.row_group(g).column(cols[c]).statistics.min
                for g in range(md.num_row_groups)
            ]
            maxs = [
                md.row_group(g).column(cols[c]).statistics.max
                for g in range(md.num_row_groups)
            ]
            assert idx[name][f"min_{c}"] == min(mins)
            assert idx[name][f"max_{c}"] == max(maxs)
        assert idx[name]["n_rows"] == md.num_rows
    assert n_files == len(idx) and n_files >= 8


def test_pruned_read_is_exactly_the_filter(spark, tmp_path):
    rows, df = _grid(spark)
    path = str(tmp_path / "zone")
    layout.write_zordered(df, path, ["x", "y"], bits=6, n_files=16)
    skipping.write_skipping_index(spark, path, ["x", "y"])
    for ranges in (
        {"x": (8, 15), "y": (8, 15)},
        {"x": (None, 5)},
        {"y": (60, None)},
        {"x": (100, 200)},  # empty result
    ):
        got = {
            tuple(r)
            for r in skipping.read_pruned(spark, path, ranges).collect()
        }
        full = spark.read.parquet(path)
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                full = full.filter(F.col(c) >= lo)
            if hi is not None:
                full = full.filter(F.col(c) <= hi)
        assert got == {tuple(r) for r in full.collect()}, ranges


def test_zordered_zone_prunes_to_a_corner(spark, tmp_path):
    _, df = _grid(spark)
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    layout.write_zordered(df, zpath, ["x", "y"], bits=6, n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )
    for p in (zpath, lpath):
        skipping.write_skipping_index(spark, p, ["x", "y"])
    box = {"x": (8, 15), "y": (8, 15)}
    z_files = skipping.prune_files(spark, zpath, box)
    l_files = skipping.prune_files(spark, lpath, box)
    n_z_total = len(skipping.read_skipping_index(spark, zpath).collect())
    # the x-sorted layout leaves y spanning 0..63 in every file, so all
    # of its x-candidates survive; z-order bounds both dims
    assert len(z_files) < len(l_files)
    assert len(z_files) <= n_z_total // 2
    # and the empty box prunes everything without reading data
    assert skipping.prune_files(spark, zpath, {"x": (999, 1000)}) == []
    assert skipping.read_pruned(spark, zpath, {"x": (999, 1000)}).count() == 0


def test_null_semantics_and_unknown_column(spark, tmp_path):
    # file A: x all null; file B: x has nulls + values — a range must
    # prune A entirely, keep B, and the residual filter drops B's nulls
    path = str(tmp_path / "zone")
    a = spark.createDataFrame([(i, None) for i in range(10)], "id long, x long")
    b = spark.createDataFrame(
        [(100 + i, None if i % 2 else i) for i in range(10)], "id long, x long"
    )
    a.coalesce(1).write.mode("append").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    skipping.write_skipping_index(spark, path, ["x"])
    idx = skipping.read_skipping_index(spark, path).collect()
    assert {r.nnull_x for r in idx} == {10, 5}
    files = skipping.prune_files(spark, path, {"x": (0, 100)})
    assert len(files) == 1
    got = skipping.read_pruned(spark, path, {"x": (0, 100)}).collect()
    assert sorted(r.x for r in got) == [0, 2, 4, 6, 8]
    # a column with no index entry never prunes
    assert len(
        skipping.prune_files(spark, path, {"id": (0, 1), "x": (0, 100)})
    ) == 1
    with pytest.raises(ValueError, match="not in zone schema"):
        skipping.skipping_index(spark, path, ["nope"])


def test_index_sidecar_invisible_to_zone_reads(spark, tmp_path):
    rows, df = _grid(spark, 256)
    path = str(tmp_path / "zone")
    df.write.parquet(path)
    before = spark.read.parquet(path).count()
    skipping.write_skipping_index(spark, path, ["x"])
    # the underscore dir is ignored by the parquet reader: same rows,
    # same schema after the sidecar lands
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.columns == ["id", "x", "y"]


def test_versioned_zone_carries_skipping_index(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.io import parquet_io

    _, df = _grid(spark)
    zone = str(tmp_path)
    p1 = parquet_io.write_versioned(
        df, zone, "grid", range_by=["x"], n_files=8, skipping_cols=["x", "y"]
    )
    assert len(skipping.read_skipping_index(spark, p1).collect()) >= 8
    # OPTIMIZE ZORDER carries a FRESH index over the rewritten layout,
    # and the pruned read over the compacted snapshot is exact
    p2 = parquet_io.compact_zone(
        spark, zone, "grid", target_mb=1, zorder_by=["x", "y"],
        zorder_bits=6, skipping_cols=["x", "y"],
    )
    assert p2 != p1
    box = {"x": (8, 15), "y": (8, 15)}
    got = {tuple(r) for r in skipping.read_pruned(spark, p2, box).collect()}
    want = {
        tuple(r)
        for r in spark.read.parquet(p2)
        .filter("x between 8 and 15 and y between 8 and 15")
        .collect()
    }
    assert got == want and len(got) == 64
    # the z-ordered rewrite prunes to a corner of its own file list
    n_total = len(skipping.read_skipping_index(spark, p2).collect())
    assert len(skipping.prune_files(spark, p2, box)) <= max(1, n_total // 2)


def test_partitioned_zone_recovers_partition_columns(spark, tmp_path):
    # ADVICE r13 (high): candidate files must be read with basePath so
    # hive-partition columns come back from the directory layout — a
    # pruned read on a partitioned zone is bit-identical to the plain
    # filter, including predicates ON the partition column itself.
    path = str(tmp_path / "zone")
    rows = [(i, i % 64, i % 4) for i in range(2048)]
    df = spark.createDataFrame(rows, "id long, x long, p long")
    df.repartition(4, "x").write.partitionBy("p").parquet(path)
    skipping.write_skipping_index(spark, path, ["x", "p"])
    for ranges in (
        {"x": (8, 15)},
        {"p": (1, 1)},
        {"x": (0, 7), "p": (2, 3)},
    ):
        pruned = skipping.read_pruned(
            spark, path, ranges, max_candidate_fraction=1.0
        )
        # partition column really present, never NULL
        assert pruned.filter(F.col("p").isNull()).count() == 0
        got = {tuple(r) for r in pruned.select("id", "x", "p").collect()}
        full = spark.read.parquet(path)
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                full = full.filter(F.col(c) >= lo)
            if hi is not None:
                full = full.filter(F.col(c) <= hi)
        want = {tuple(r) for r in full.select("id", "x", "p").collect()}
        assert got == want and got, ranges
    # a partition-range predicate prunes to that partition's files
    n_total = len(skipping.read_skipping_index(spark, path).collect())
    assert len(skipping.prune_files(spark, path, {"p": (1, 1)})) <= n_total // 2


def test_weak_predicate_falls_back_to_plain_scan(spark, tmp_path):
    # VERDICT r13 Next #3: a non-selective predicate must NOT funnel
    # the whole manifest through the driver — above the candidate
    # fraction threshold the reader short-circuits to a plain zone
    # scan (every data file in the plan), while a selective predicate
    # keeps the explicit pruned file list.
    rows, df = _grid(spark)
    path = str(tmp_path / "zone")
    layout.write_zordered(df, path, ["x", "y"], bits=6, n_files=16)
    skipping.write_skipping_index(spark, path, ["x", "y"])
    all_files = {
        os.path.basename(f)
        for f in spark.read.parquet(path).inputFiles()
    }
    # weak: x <= 62 matches ~every file -> plain-scan plan
    weak = skipping.read_pruned(spark, path, {"x": (None, 62)})
    assert {os.path.basename(f) for f in weak.inputFiles()} == all_files
    assert weak.count() == df.filter("x <= 62").count()
    # strong: 2-D box -> pruned file list strictly smaller than the zone
    strong = skipping.read_pruned(spark, path, {"x": (8, 15), "y": (8, 15)})
    strong_files = {os.path.basename(f) for f in strong.inputFiles()}
    assert strong_files < all_files
    assert len(strong_files) == len(
        skipping.prune_files(spark, path, {"x": (8, 15), "y": (8, 15)})
    )
    assert strong.count() == 64
