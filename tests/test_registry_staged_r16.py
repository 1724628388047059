"""Evidence for the staged r16 row (registry_staged_r16): bit-exact
DuckDB twin at sf0.001 AND sf0.01 plus the not-registered tripwire —
the same discipline as the r12-r15 staged tests."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r16

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


STAGED_SQL = registry_staged_r16.build_staged_oracle_sql()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(registry_staged_r16.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r16_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r16.STAGED_QUERIES[name](spark, sf_dir)
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


def test_staged_r16_not_registered_yet():
    for name in registry_staged_r16.STAGED_QUERIES:
        assert name not in registry.SPARK_QUERIES




def test_staged_r16_quantile_leg_is_nondegenerate(spark):
    """Three distinct quantile estimates with real spread (else the
    histogram degenerated into one bucket)."""
    out = registry_staged_r16.STAGED_QUERIES["hdr_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    qs = {r.quantile: r.lo for r in out if r.stat == "q"}
    assert set(qs) == {0.5, 0.95, 0.99}
    assert qs[0.5] < qs[0.95] <= qs[0.99]
    buckets = [r for r in out if r.stat == "bucket"]
    assert 20 < len(buckets) <= 64 * 64


def test_staged_r16_kcore_semantics(spark):
    """Structural pins for the kcore_audit fixture: the 2-core is
    exactly the ring+chords (every pendant-path node peeled, so no
    synthetic id ≥ 10^6 survives), the 5-core is empty, and Spark
    converges within the oracle's SIX unrolled peel levels (kcore runs
    with max_iter=6 and raises if unconverged — the parity tripwire)."""
    sf = "/root/testdata/sf0.001"
    rows = registry_staged_r16.STAGED_QUERIES["kcore_audit"](
        spark, sf
    ).collect()
    k2 = {r.n: r.degree for r in rows if r.stat == "k2"}
    assert not [r for r in rows if r.stat == "k5"]  # empty-core branch
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert set(k2) == set(range(n_docs))  # ring survives, pendants don't
    assert all(d >= 2 for d in k2.values())
    # chord endpoints carry degree 3; plain ring nodes degree 2
    assert k2[0] == 3 and k2[1] == 2


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r16.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r16_parity_with_replaced_rows(spark, union_name, legs):
    """Each r16 funding consolidation reproduces the registered legs'
    row counts (stat-tagged unions sum) and carries one stat per leg;
    every leg is a live registry row until the r16 swap."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r16.STAGED_QUERIES[union_name](spark, sf)
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    for leg in legs:
        assert leg in registry.SPARK_QUERIES
    n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
    assert union_df.count() == n_legs
    stats = {r["stat"] for r in union_df.select("stat").distinct().collect()}
    assert len(stats) == 2
