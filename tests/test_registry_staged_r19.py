"""Evidence for the staged r19 rows (registry_staged_r19): bit-exact
DuckDB twin at sf0.001 AND sf0.01, the not-registered tripwire,
funding-union parity with the live legs, and non-degeneracy pins for
the privacy and IVM semantics — the r12-r17 staged-test discipline."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r19

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


STAGED_SQL = registry_staged_r19.build_staged_oracle_sql()


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("name", sorted(registry_staged_r19.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r19_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r19.STAGED_QUERIES[name](spark, sf_dir)
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


def test_staged_r19_not_registered_yet():
    for name in registry_staged_r19.STAGED_QUERIES:
        assert name not in registry.SPARK_QUERIES


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r19.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r19_parity_with_replaced_rows(spark, union_name, legs):
    """Each funding consolidation reproduces the registered legs' row
    counts (stat-tagged unions sum) and carries every leg family's
    stat tags; the legs are live registry rows until the r19 swap."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r19.STAGED_QUERIES[union_name](spark, sf)
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    for leg in legs:
        assert leg in registry.SPARK_QUERIES  # rotates into the r19 head
    n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
    assert union_df.count() == n_legs
    stats = {r["stat"] for r in union_df.select("stat").distinct().collect()}
    if union_name == "embfam_audit":
        assert stats == {"lsh", "cluster"}
    else:
        assert len(stats) >= 3  # sketchfam's own tags + kmv's


def test_staged_r19_skew_semantics(spark):
    """Non-degeneracy pins at sf0.001: the analytic hot keys really
    are hot (the salted paths get exercised under genuine skew), and
    the salted results equal their plain twins by direct comparison,
    not only through the oracle."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = registry_staged_r19.STAGED_QUERIES["skewjoin_audit"](
        spark, sf
    ).collect()
    by_grp = {r.grp: r.n_rows for r in rows}
    # key 0 (grp 0) holds ~a third of lineitem — dominant by far
    assert by_grp[0] > 3 * max(v for g, v in by_grp.items() if g != 0)
    agg = registry_staged_r19.STAGED_QUERIES["saltagg_audit"](
        spark, sf
    ).collect()
    hot = next(r for r in agg if r.hot == "hot")
    total = sum(r.n for r in agg)
    assert hot.n > total // 3  # ~half the orders on one key
    assert hot.mn <= hot.mx and hot.cents >= hot.mx
    # direct twin: salted agg == plain groupBy on the same frame
    from peskas_mozambique_data_pipeline_spark.session import read_table

    orders = read_table(spark, sf, "orders")
    hotc = F.when(F.col("o_custkey") % 2 == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("c"), (F.col("o_custkey") % 11).cast("string"))
    )
    plain = {
        r.hot: (r.n, r.cents)
        for r in orders.select(
            hotc.alias("hot"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("hot")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("cents"))
        .collect()
    }
    assert {r.hot: (r.n, r.cents) for r in agg} == plain
