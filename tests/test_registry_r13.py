"""Round-13 in-round rows: union leg parity and retirement
bookkeeping for the two funding consolidations (crawlfam_audit =
fetch_audit + crawl_audit; geofam_audit = geo_assign +
geo_rollup_join — legs verbatim, the registry_r10/r11/r12 pattern)."""

from __future__ import annotations

from peskas_mozambique_data_pipeline_spark import registry, registry_r13

SF = "/root/testdata/sf0.001"


def test_crawlfam_audit_leg_parity(spark):
    union_rows = registry_r13.q_crawlfam_audit(spark, SF)
    a = registry.RETIRED_QUERIES["fetch_audit"](spark, SF).collect()
    b = registry.RETIRED_QUERIES["crawl_audit"](spark, SF).collect()
    assert union_rows.count() == len(a) + len(b)
    fetch = {
        (r.k1, r.k2): r.n
        for r in union_rows.filter("stat = 'fetch'").collect()
    }
    for r in a:
        assert fetch[(str(r.doc_id), r.url)] == r.fetch_offset_ms
    crawl = {
        (r.stat, r.k1, r.k2, r.k3): r.p
        for r in union_rows.filter("stat <> 'fetch'").collect()
    }
    for r in b:
        assert crawl[(r.stat, r.k1, r.k2, r.k3)] == r.p


def test_geofam_audit_leg_parity(spark):
    union_rows = registry_r13.q_geofam_audit(spark, SF)
    a = registry.RETIRED_QUERIES["geo_assign"](spark, SF).collect()
    b = registry.RETIRED_QUERIES["geo_rollup_join"](spark, SF).collect()
    assert union_rows.count() == len(a) + len(b)
    assign = {
        r.id: (r.k1, r.x, r.y)
        for r in union_rows.filter("stat = 'assign'").collect()
    }
    for r in a:
        assert assign[r.pid] == (r.region, r.lon, r.lat)
    rollup = {
        r.k1: (r.k2, r.n, r.x)
        for r in union_rows.filter("stat = 'rollup'").collect()
    }
    for r in b:
        assert rollup[r.region] == (r.r_name, r.n_submissions, r.mean_acctbal)


def test_r13_inround_swap_landed():
    for name in registry_r13.SPARK_QUERIES:
        assert registry.SPARK_QUERIES[name] is registry_r13.SPARK_QUERIES[name]
    sql = registry_r13.build_oracle_sql()
    for name, text in sql.items():
        assert registry.ORACLE_SQL[name] == text
    for pair in registry_r13.AUDIT_REPLACES.values():
        for old in pair:
            assert old not in registry.SPARK_QUERIES
            assert old in registry.RETIRED_QUERIES
            assert old in registry.RETIRED_ORACLE_SQL
