"""Round-12 in-round rows: union leg parity, retirement bookkeeping,
and kmv_audit semantics (both estimator branches)."""

from __future__ import annotations

from peskas_mozambique_data_pipeline_spark import registry, registry_r12

SF = "/root/testdata/sf0.001"


def test_weights_audit_leg_parity(spark):
    union_rows = registry_r12.q_weights_audit(spark, SF)
    a = registry.RETIRED_QUERIES["dsir_weights"](spark, SF).collect()
    b = registry.RETIRED_QUERIES["temperature_resample"](spark, SF).collect()
    assert union_rows.count() == len(a) + len(b)
    dsir = {
        r.k1: (r.n, r.v)
        for r in union_rows.filter("stat = 'dsir'").collect()
    }
    for r in a:
        assert dsir[str(r.doc_id)] == (r.n_tokens, r.dsir_weight)
    resample = {
        r.k1: (r.n, r.n2, r.v)
        for r in union_rows.filter("stat = 'resample'").collect()
    }
    for r in b:
        assert resample[r.source] == (r.n_docs, r.n_kept, r.frac_kept)


def test_r12_inround_swap_landed():
    for name in registry_r12.SPARK_QUERIES:
        assert registry.SPARK_QUERIES[name] is registry_r12.SPARK_QUERIES[name]
    sql = registry_r12.build_oracle_sql()
    for name, text in sql.items():
        assert registry.ORACLE_SQL[name] == text
    for pair in registry_r12.AUDIT_REPLACES.values():
        for old in pair:
            assert old not in registry.SPARK_QUERIES
            assert old in registry.RETIRED_QUERIES
            assert old in registry.RETIRED_ORACLE_SQL


def test_kmv_audit_covers_both_estimator_branches(spark):
    out = registry_r12.q_kmv_audit(spark, SF).collect()
    k = registry_r12._KMV_K
    est = {(r.tbl, r.grp): r.est for r in out if r.stat == "est"}
    n_hashes = {}
    for r in out:
        if r.stat == "kmv":
            n_hashes[(r.tbl, r.grp)] = max(
                n_hashes.get((r.tbl, r.grp), 0), r.pos
            )
    # documents/source: 25 distinct texts per group — the n<k EXACT
    # branch, where the estimate IS the stored hash count
    doc_keys = [key for key in est if key[0] == "docs"]
    assert doc_keys
    for key in doc_keys:
        assert n_hashes[key] < k
        assert est[key] == float(n_hashes[key])
    # lineitem/returnflag: >k distinct order keys per group — the
    # unbiased (k-1)*2^60/h_k branch: sketch truncated at exactly k,
    # estimate well above k
    line_keys = [key for key in est if key[0] == "line"]
    assert line_keys
    for key in line_keys:
        assert n_hashes[key] == k
        assert est[key] > k
