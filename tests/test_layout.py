"""Z-order layout family: exact Morton keys (python + DuckDB twins),
the locality they buy over a linear sort, and the clustered writer."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import layout


def _morton_py(rows, cols, bits):
    los = {c: min(r[c] for r in rows) for c in cols}
    his = {c: max(r[c] for r in rows) for c in cols}
    d = len(cols)
    out = []
    for r in rows:
        key = 0
        for ci, c in enumerate(cols):
            b = (r[c] - los[c]) * (1 << bits) // (his[c] - los[c] + 1)
            for j in range(bits):
                key += ((b >> j) & 1) << (j * d + ci)
        out.append(key)
    return out


def test_zorder_key_matches_python_twin(spark):
    rows = [
        {"id": i, "x": (i * 37) % 101, "y": (i * 91) % 257}
        for i in range(300)
    ]
    df = spark.createDataFrame(
        [(r["id"], r["x"], r["y"]) for r in rows], "id long, x long, y long"
    )
    got = {
        r.id: r.zkey
        for r in layout.zorder_key(df, ["x", "y"], bits=8).collect()
    }
    want = dict(zip([r["id"] for r in rows], _morton_py(rows, ["x", "y"], 8)))
    assert got == want


def test_zorder_locality_beats_linear_sort(spark):
    # a 64x64 grid: Z-order buckets must bound BOTH dims; a linear
    # sort on x leaves y's span at full range in every bucket
    rows = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    keyed = layout.zorder_key(df, ["x", "y"], bits=6)
    idx = layout.zorder_index(keyed, ["x", "y"], bits=6, bucket_bits=4)
    got = idx.collect()
    assert len(got) == 16 and sum(r.n_rows for r in got) == 4096
    z_span_y = sum(r.max_y - r.min_y for r in got) / len(got)
    lin = df.withColumn("zkey", F.col("x"))
    lin_idx = layout.zorder_index(lin, ["x", "y"], bits=3, bucket_bits=2)
    lin_span_y = sum(r.max_y - r.min_y for r in lin_idx.collect()) / max(
        1, lin_idx.count()
    )
    # each Z bucket is a 16x16-ish hypercube: y span ~15 vs ~63 linear
    assert z_span_y < 20 < lin_span_y
    # x is bounded too — multi-dimension locality, the point of Morton
    assert sum(r.max_x - r.min_x for r in got) / len(got) < 20


def test_zorder_nulls_bucket_low_and_width_guard(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 10, 5), (2, None, 9), (3, 90, 1)], "id long, x long, y long"
    )
    got = {r.id: r.zkey for r in layout.zorder_key(df, ["x", "y"], bits=4).collect()}
    # the null-x row keys as if x were at the low corner (bucket 0)
    null_like = {
        r.id: r.zkey
        for r in layout.zorder_key(
            df.fillna({"x": 10}), ["x", "y"], bits=4
        ).collect()
    }
    assert got[2] == null_like[2]
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_roundtrip_and_file_locality(spark, tmp_path):
    rows = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "zonez")
    layout.write_zordered(df, path, ["x", "y"], bits=6, n_files=16)
    back = spark.read.parquet(path)
    assert back.columns == ["id", "x", "y"]  # key dropped
    assert {tuple(r) for r in back.collect()} == set(rows)  # content exact
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(per_file) > 4
    # every file's footer bounds BOTH dims well under the global span
    assert sum(r.sx for r in per_file) / len(per_file) < 32
    assert sum(r.sy for r in per_file) / len(per_file) < 32


def test_zorder_duckdb_parity(spark):
    """Keys replay bit-exactly in DuckDB over the same parquet
    (staged-row-grade evidence without a registry slot)."""
    import duckdb

    src = "/root/testdata/sf0.001/lineitem.parquet"
    if not os.path.exists(src):
        import pytest

        pytest.skip("driver testdata not present")
    df = spark.read.parquet(src).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    keyed = layout.zorder_key(df, ["l_partkey", "l_suppkey"], bits=8)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    # compare as a multiset
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.zkey)
        for r in keyed.select("l_orderkey", "l_linenumber", "zkey").collect()
    )
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH s AS (
          SELECT MIN(l_partkey) AS lo1, MAX(l_partkey) AS hi1,
                 MIN(l_suppkey) AS lo2, MAX(l_suppkey) AS hi2
          FROM read_parquet('{src}')
        ),
        b AS (
          SELECT l_orderkey, l_linenumber,
                 (l_partkey - lo1) * 256 // (hi1 - lo1 + 1) AS b1,
                 (l_suppkey - lo2) * 256 // (hi2 - lo2 + 1) AS b2
          FROM read_parquet('{src}'), s
        )
        SELECT l_orderkey, l_linenumber,
               (SELECT SUM((((b1 >> CAST(j AS INT)) & 1) << CAST(2*j AS INT))
                         + (((b2 >> CAST(j AS INT)) & 1) << CAST(2*j+1 AS INT)))
                FROM range(8) t(j)) AS zkey
        FROM b
        """
    ).fetchall()
    con.close()
    want = sorted((o, ln, int(z)) for o, ln, z in rows)
    assert got == want and len(got) > 1000


def test_zorder_key_wide_span_does_not_wrap(spark):
    # nanosecond-epoch-scale spans: (v − lo) · 2^bits in BIGINT wraps
    # once hi − lo exceeds 2^(63−bits); the decimal(38,0) path must
    # produce the exact python-int bucket instead of garbage
    lo, hi = 0, (1 << 62) + 7
    vals = [lo, hi, hi // 2, hi // 3]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vals)], "id long, x long, y long"
    )
    got = {
        r.id: r.zkey
        for r in layout.zorder_key(df, ["x", "y"], bits=8).collect()
    }
    span = hi - lo + 1

    def interleave(bx, by):
        k = 0
        for j in range(8):
            k |= ((bx >> j) & 1) << (j * 2)
            k |= ((by >> j) & 1) << (j * 2 + 1)
        return k

    for i, v in enumerate(vals):
        assert got[i] == interleave((v - lo) * 256 // span, 0), (i, v)


def test_zorder_scan_pruning_beats_linear_layout(spark, tmp_path):
    """END-TO-END file skipping (VERDICT r12 Next #6): count, from the
    real parquet footers, how many files a box predicate must touch —
    a reader prunes a file when the predicate box misses its min/max
    envelope on either dim.  On the 64×64 fixture the z-ordered layout
    must touch a small corner of the files a linear (single-dim) sort
    leaves as candidates, and the filtered read must return identical
    rows from both layouts."""
    import pyarrow.parquet as pq

    rows = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    layout.write_zordered(df, zpath, ["x", "y"], bits=6, n_files=16)
    # linear layout: same file count, ordered by x only
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )

    def candidate_files(path, lo, hi):
        hit, total = 0, 0
        for name in os.listdir(path):
            if not name.endswith(".parquet"):
                continue
            total += 1
            md = pq.ParquetFile(os.path.join(path, name)).metadata
            cols = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for c in ("x", "y"):
                    st = md.row_group(rg).column(cols[c]).statistics
                    mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                    maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
            if all(maxs[c] >= lo and mins[c] <= hi for c in ("x", "y")):
                hit += 1
        return hit, total

    lo, hi = 8, 15  # an 8×8 box = 64 of 4096 cells
    z_hit, z_total = candidate_files(zpath, lo, hi)
    l_hit, l_total = candidate_files(lpath, lo, hi)
    assert z_total >= 8 and l_total >= 8
    # the x-sorted layout bounds x but leaves y spanning 0..63 in every
    # file: every x-candidate file survives the y test too.  Z-order
    # bounds BOTH dims, so the box touches strictly fewer files.
    assert z_hit < l_hit, (z_hit, l_hit)
    assert z_hit <= z_total // 2, (z_hit, z_total)
    # and the pruned layout still answers the query exactly
    pred = f"x between {lo} and {hi} and y between {lo} and {hi}"
    got_z = {tuple(r) for r in spark.read.parquet(zpath).filter(pred).collect()}
    got_l = {tuple(r) for r in spark.read.parquet(lpath).filter(pred).collect()}
    want = {r for r in rows if lo <= r[1] <= hi and lo <= r[2] <= hi}
    assert got_z == got_l == want
