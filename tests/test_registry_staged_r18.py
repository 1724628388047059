"""Evidence for the staged r18 rows (registry_staged_r18): bit-exact
DuckDB twin at sf0.001 AND sf0.01, the not-registered tripwire,
funding-union parity with the live legs, and non-degeneracy pins for
the privacy and IVM semantics — the r12-r17 staged-test discipline."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r18

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


STAGED_SQL = registry_staged_r18.build_staged_oracle_sql()


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("name", sorted(registry_staged_r18.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r18_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r18.STAGED_QUERIES[name](spark, sf_dir)
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


def test_staged_r18_not_registered_yet():
    for name in registry_staged_r18.STAGED_QUERIES:
        assert name not in registry.SPARK_QUERIES


def test_staged_r18_privacy_semantics(spark):
    """Non-degeneracy pins at sf0.001: risky singletons exist (the
    mod-97 rares), common classes are safe AND diverse, suppression
    keeps exactly the non-rare population."""
    sf = "/root/testdata/sf0.001"
    rows = registry_staged_r18.STAGED_QUERIES["privacy_audit"](
        spark, sf
    ).collect()
    kanon = next(r for r in rows if r.leg == "kanon")
    assert kanon.n4 == 1  # min class size: the singleton rares
    assert 0 < kanon.n5 < kanon.n3  # some risky classes, not all
    assert kanon.n6 == kanon.n5  # every risky class is a singleton
    ldiv = {r.k1: r for r in rows if r.leg == "ldiv"}
    rares = [r for k, r in ldiv.items() if k.startswith("rare_")]
    commons = [r for k, r in ldiv.items() if k.startswith("common_")]
    assert rares and commons and len(commons) == 7
    assert all(r.n2 == 1 and r.n3 == 0 for r in rares)
    assert all(r.n3 == 1 for r in commons)  # all five segments present
    sup = [r for r in rows if r.leg == "sup"]
    assert {r.k1 for r in sup} == {f"common_{i}" for i in range(7)}
    assert sum(r.n1 for r in sup) == kanon.n2 - kanon.n6


def test_staged_r18_ivm_semantics(spark):
    """The delta carries genuine retractions AND applications: every
    mktsegment group nets negative (old payloads retracted), every
    order-priority group nets positive (winners applied), and total
    count movement equals upsert winners minus touched state rows
    (python replay over DuckDB reads)."""
    sf = "/root/testdata/sf0.001"
    rows = registry_staged_r18.STAGED_QUERIES["ivm_audit"](
        spark, sf
    ).collect()
    segs = [r for r in rows if not r.grp[0].isdigit()]
    prios = [r for r in rows if r.grp[0].isdigit()]
    assert segs and prios
    assert all(r.n_rows < 0 and r.sum_cents < 0 for r in segs)
    assert all(r.n_rows > 0 and r.sum_cents > 0 for r in prios)
    con = duckdb.connect()
    n_winners, n_upserts = con.execute(
        f"""
        WITH ch AS (
          SELECT o_custkey AS k, o_orderkey AS seq,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'delete'
                      ELSE 'upsert' END AS op
          FROM read_parquet('{sf}/orders.parquet')
          WHERE o_custkey % 5 <> 0
        ),
        win AS (
          SELECT * FROM (
            SELECT ch.*, ROW_NUMBER() OVER (
              PARTITION BY k ORDER BY seq DESC) AS rn
            FROM ch) WHERE rn = 1
        )
        SELECT COUNT(*),
               SUM(CASE WHEN op = 'upsert' THEN 1 ELSE 0 END)
        FROM win
        """
    ).fetchone()
    n_touched_state = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf}/customer.parquet')
        WHERE c_custkey IN (
          SELECT DISTINCT o_custkey
          FROM read_parquet('{sf}/orders.parquet')
          WHERE o_custkey % 5 <> 0)
        """
    ).fetchone()[0]
    con.close()
    assert sum(r.n_rows for r in rows) == n_upserts - n_touched_state
    assert n_winners > n_upserts  # deletes present among winners


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r18.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r18_parity_with_replaced_rows(spark, union_name, legs):
    """Each funding consolidation reproduces the registered legs' row
    counts (stat-tagged unions sum) and carries every leg family's
    stat tags; the legs are live registry rows until the r18 swap."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r18.STAGED_QUERIES[union_name](spark, sf)
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    for leg in legs:
        assert leg in registry.SPARK_QUERIES  # rotates into the r18 head
    n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
    assert union_df.count() == n_legs
    stats = {r["stat"] for r in union_df.select("stat").distinct().collect()}
    if union_name == "dedupall_audit":
        assert stats == {"jaccard", "hamming", "exact", "cluster"}
    else:
        assert stats == {"trail", "twa"}
