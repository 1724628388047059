"""Evidence for the staged r17 row (registry_staged_r17): bit-exact
DuckDB twin at sf0.001 AND sf0.01 plus the not-registered tripwire —
the same discipline as the r12-r16 staged tests."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r17

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


STAGED_SQL = registry_staged_r17.build_staged_oracle_sql()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(registry_staged_r17.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r17_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r17.STAGED_QUERIES[name](spark, sf_dir)
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


def test_staged_r17_not_registered_yet():
    for name in registry_staged_r17.STAGED_QUERIES:
        assert name not in registry.SPARK_QUERIES






def test_staged_r17_dq_semantics(spark):
    """Non-degeneracy pins: every report rule has violations AND
    passes at sf0.001 (both predicate sides populated), the unique leg
    counts all copies of duplicated keys, the referential leg tracks
    the mod-3 dim, and the annotation leg carries multi-rule rows."""
    sf = "/root/testdata/sf0.001"
    rows = registry_staged_r17.STAGED_QUERIES["dq_audit"](spark, sf).collect()
    rep = {r.k1: r for r in rows if r.leg == "report"}
    n = rep["price_hi"].n2
    for rule in ("price_hi", "status_known", "prio_urgent"):
        assert 0 < rep[rule].n1 < n, rule
    assert rep["unique(o_custkey)"].n1 > 0
    assert 0 < rep["in_dim(o_custkey)"].n1 < n
    ann = [r for r in rows if r.leg == "ann"]
    assert len(ann) == n
    multi = [r for r in ann if "," in (r.k2 or "")]
    clean = [r for r in ann if r.k2 == ""]
    assert multi and clean  # both extremes present


def test_staged_r17_cdc_semantics(spark):
    """Non-degeneracy pins for cdc_audit at sf0.001: untouched,
    replaced and deleted keys all present; the winner really is the
    highest-seq change (spot-checked against a python replay)."""
    sf = "/root/testdata/sf0.001"
    import duckdb

    state = {
        r.c_custkey: (r.c_name, r.bal_c)
        for r in registry_staged_r17.STAGED_QUERIES["cdc_audit"](
            spark, sf
        ).collect()
    }
    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey, c_name, CAST(round(c_acctbal*100) AS BIGINT)"
        f" FROM read_parquet('{sf}/customer.parquet')"
    ).fetchall()
    orders = con.execute(
        f"SELECT o_custkey, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)"
        f" FROM read_parquet('{sf}/orders.parquet')"
        f" WHERE o_custkey % 5 <> 0"
    ).fetchall()
    con.close()
    latest = {}
    for ck, ok, cents in orders:
        if ck not in latest or ok > latest[ck][0]:
            latest[ck] = (ok, cents)
    want = {}
    cust_keys = {ck for ck, _n, _c in cust}
    for ck, name, cents in cust:
        if ck not in latest:
            want[ck] = (name, cents)
    for ck, (ok, ocents) in latest.items():
        # upsert winners replace existing keys AND insert order-only
        # custkeys the synthetic data may carry; delete winners drop
        if ok % 7 != 0:
            want[ck] = (f"u{ok}", ocents)
    assert state == want
    untouched = sum(1 for ck in cust_keys if ck not in latest)
    deleted = sum(1 for ck in latest if latest[ck][0] % 7 == 0)
    inserts = sum(1 for ck in latest
                  if ck not in cust_keys and latest[ck][0] % 7 != 0)
    assert untouched > 0 and deleted > 0
    assert len(state) == len(want) >= untouched + inserts


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r17.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r17_parity_with_replaced_rows(spark, union_name, legs):
    """Each funding consolidation reproduces the registered legs' row
    counts (stat-tagged unions sum); every leg is a live registry row
    until the r17 swap lands."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r17.STAGED_QUERIES[union_name](spark, sf)
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    for leg in legs:
        assert leg in registry.SPARK_QUERIES  # rotates into the r17 head
    n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
    assert union_df.count() == n_legs
    stats = {r["stat"] for r in union_df.select("stat").distinct().collect()}
    # webfam carries crawlfam's own stat tags + 'html'; docfam carries
    # docmeta + the lexstats family tags — both sides present
    if union_name == "webfam_audit":
        assert "html" in stats and len(stats) >= 3
    else:
        assert "docmeta" in stats and len(stats) >= 2
