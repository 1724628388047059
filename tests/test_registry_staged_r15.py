"""Evidence for the staged r15 row (registry_staged_r15): bit-exact
DuckDB twin at sf0.001 AND sf0.01 plus the not-registered tripwire —
the same discipline as the r12/r13/r14 staged tests."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from peskas_mozambique_data_pipeline_spark import registry, registry_staged_r15

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


STAGED_SQL = registry_staged_r15.build_staged_oracle_sql()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(registry_staged_r15.STAGED_QUERIES))
@pytest.mark.slow
def test_staged_r15_oracle_bit_exact(spark, name, sf_dir):
    sdf = registry_staged_r15.STAGED_QUERIES[name](spark, sf_dir)
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


def test_staged_r15_not_registered_yet():
    for name in registry_staged_r15.STAGED_QUERIES:
        assert name not in registry.SPARK_QUERIES


def test_staged_r15_bloom_probe_leg_is_nondegenerate(spark):
    """The probe leg must show false positives AND true negatives at
    sf0.001 (members always probe true by construction), or the
    approximate operator degenerates into an exact membership join."""
    out = registry_staged_r15.STAGED_QUERIES["bloom_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    probes = {r.doc_id: r.bv for r in out if r.stat == "probe"}
    members = {d for d in probes if d % 17 == 0}
    assert all(probes[d] == 1 for d in members)  # no false negatives
    non = {d: v for d, v in probes.items() if d % 17 != 0}
    assert any(v == 1 for v in non.values())  # deterministic FPs exist
    assert any(v == 0 for v in non.values())  # and true negatives too
    n_bits = [r.bv for r in out if r.stat == "occ"]
    assert len(n_bits) == 1 and 0 < n_bits[0] <= 512


def test_staged_r15_zorder_index_leg_shows_locality(spark):
    """The idx leg must demonstrate the property the family exists
    for: many populated key ranges whose per-dimension spans are far
    below the global span (else the interleave degenerated)."""
    out = registry_staged_r15.STAGED_QUERIES["zorder_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    idx = [r for r in out if r.stat == "idx"]
    assert len(idx) > 16
    glob_p = max(r.v3 for r in idx) - min(r.v2 for r in idx)
    avg_span_p = sum(r.v3 - r.v2 for r in idx) / len(idx)
    assert avg_span_p < glob_p / 2


@pytest.mark.parametrize(
    "union_name,legs", sorted(registry_staged_r15.STAGED_REPLACES.items())
)
@pytest.mark.slow
def test_staged_r15_parity_with_replaced_rows(spark, union_name, legs):
    """Each funding consolidation reproduces the registered legs' row
    counts (stat-tagged unions sum); every leg sits in the r13 head
    (= the r15 rotating-in set) until the r15 swap.  annfam_audit's
    legs are themselves unions, so its stat count is 4 (two per leg)."""
    sf = "/root/testdata/sf0.001"
    union_df = registry_staged_r15.STAGED_QUERIES[union_name](spark, sf)
    reg = {**registry.SPARK_QUERIES, **registry.RETIRED_QUERIES}
    for leg in legs:
        assert leg in registry.SPARK_QUERIES  # sits in the r13 head
    n_legs = sum(reg[leg](spark, sf).count() for leg in legs)
    assert union_df.count() == n_legs
    stats = {r["stat"] for r in union_df.select("stat").distinct().collect()}
    assert len(stats) == (4 if union_name == "annfam_audit" else 2)
