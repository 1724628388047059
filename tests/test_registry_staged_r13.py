"""Evidence for the staged r13 row (registry_staged_r13): bit-exact
DuckDB twin at sf0.001 AND sf0.01 plus the not-registered tripwire —
the same discipline as the r11/r12 staged tests."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r13

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001/documents.parquet"),
    reason="driver testdata not present",
)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _exact(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return fa == fb or (math.isnan(fa) and math.isnan(fb))
    return str(a) == str(b)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


STAGED_SQL = registry_staged_r13.build_staged_oracle_sql()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(registry_staged_r13.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r13_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r13.STAGED_QUERIES[name](spark, sf_dir)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    con = _duck(sf_dir)
    try:
        res = con.execute(STAGED_SQL[name])
        dcols = [d[0] for d in res.description]
        drows = _norm(res.fetchall(), dcols)
    finally:
        con.close()
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in dcols
    )
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    for rs, rd in zip(srows, drows):
        assert all(_exact(a, b) for a, b in zip(rs, rd)), (name, rs, rd)


def test_staged_r13_cell_count_is_triangle(spark):
    """d=64 → exactly d(d+1)/2 = 2080 upper-triangle cells."""
    out = registry_staged_r13.STAGED_QUERIES["pca_cov"](
        spark, "/root/testdata/sf0.001"
    )
    assert out.count() == 64 * 65 // 2


def test_staged_r13_corpus_card_retention_semantics(spark):
    """The card rows sit in DAG order and each permille is the exact
    floor of 1000·n_rows/prev_rows — verified against an independent
    python recompute of the zone chain."""
    rows = sorted(
        (r.pos, r.zone, r.n_rows, r.n_tokens, r.n_chars,
         r.retained_rows_permille)
        for r in registry_staged_r13.STAGED_QUERIES["corpus_card"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    assert [z for _p, z, *_ in rows] == [
        "corpus_ingested", "corpus_filtered", "corpus_deduped",
        "corpus_packs",
    ]
    con = _duck("/root/testdata/sf0.001")
    try:
        n_all = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
        n_filt = con.execute(
            "SELECT COUNT(*) FROM documents WHERE length(text) >= 50"
        ).fetchone()[0]
        n_dedup = con.execute(
            "SELECT COUNT(*) FROM documents "
            "WHERE length(text) >= 50 AND doc_id % 7 <> 0"
        ).fetchone()[0]
        n_packs = con.execute(
            "SELECT COUNT(DISTINCT doc_id % 8) FROM documents "
            "WHERE length(text) >= 50 AND doc_id % 7 <> 0"
        ).fetchone()[0]
    finally:
        con.close()
    counts = [n_all, n_filt, n_dedup, n_packs]
    assert [n for _p, _z, n, *_ in rows] == counts
    assert rows[0][5] is None  # first zone has no predecessor
    for i in range(1, 4):
        assert rows[i][5] == counts[i] * 1000 // counts[i - 1]
    # packs are not document-shaped: token/char totals are NULL
    assert rows[3][3] is None and rows[3][4] is None


def test_staged_swap_landed_r13():
    # the r13 registration swap happened: each staged row is registered
    # VERBATIM (same function object, same SQL string) and the rows the
    # consolidations replace are retired but importable for the gate
    sql = registry_staged_r13.build_staged_oracle_sql()
    for name in registry_staged_r13.STAGED_QUERIES:
        assert (
            registry.SPARK_QUERIES[name]
            is registry_staged_r13.STAGED_QUERIES[name]
        )
        assert registry.ORACLE_SQL[name] == sql[name]
    for pair in registry_staged_r13.STAGED_REPLACES.values():
        for old in pair:
            assert old not in registry.SPARK_QUERIES
            assert old in registry.RETIRED_QUERIES
            assert old in registry.RETIRED_ORACLE_SQL


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r13.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r13_parity_with_replaced_rows(spark, union_name, legs):
    """Each consolidation reproduces the registered legs' row counts
    (1:1-join rows keep each leg's count; stat-tagged unions sum)."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r13.STAGED_QUERIES[union_name](spark, sf)
    n_union = union_df.count()
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    if union_name == "docmeta_audit":
        for leg in legs:
            assert n_union == reg[leg](spark, sf).count()
    else:
        n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
        assert n_union == n_legs
        stats = {
            r["stat"] for r in union_df.select("stat").distinct().collect()
        }
        assert len(stats) == 2


def test_staged_r13_nearest_audit_margins():
    """Cross-engine safety of the trig row: replay the synthesis in
    pure python and check every candidate distance sits far from (a)
    the 400 km range gate, (b) the 3dp rounding-grid midpoint, and (c)
    that every per-point argmin gap is macroscopic — so last-ulp libm
    differences between Spark's and DuckDB's sin/cos/asin can never
    flip a decision (the boundary_audit discipline)."""
    import math

    con = duckdb.connect()
    keys = [
        k
        for sf in ("sf0.001", "sf0.01")
        for (k,) in con.execute(
            f"SELECT c_custkey FROM read_parquet('/root/testdata/{sf}/customer.parquet')"
        ).fetchall()
    ]
    con.close()
    sites = registry_staged_r13.NEAREST_SITES
    rng = registry_staged_r13._NEAREST_RANGE_M
    min_gate, min_round, min_gap = 1e18, 1e18, 1e18
    for k in keys:
        lon = 30.0 + (k * 37 % 1000) / 100.0
        lat = -26.0 + (k * 53 % 700) / 50.0
        ds = []
        for slon, slat in sites.values():
            a = (
                math.sin(math.radians(slat - lat) / 2) ** 2
                + math.cos(math.radians(lat))
                * math.cos(math.radians(slat))
                * math.sin(math.radians(slon - lon) / 2) ** 2
            )
            d = 2 * 6371008.8 * math.asin(math.sqrt(a))
            ds.append(d)
            min_gate = min(min_gate, abs(d - rng))
            frac = (d * 1000) % 1
            min_round = min(min_round, abs(frac - 0.5))
        in_range = sorted(d for d in ds if d <= rng)
        if len(in_range) >= 2:
            min_gap = min(min_gap, in_range[1] - in_range[0])
    # worst-case cross-engine libm drift on this chain is << 1e-6 m
    assert min_gate > 1e-3, min_gate
    assert min_round > 1e-6, min_round
    assert min_gap > 1e-3, min_gap
