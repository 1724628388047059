"""End-to-end pipeline-parity tests: raw wide survey fixture →
preprocess → validate → metrics → export, with the reference's edge
cases planted (all-NA species groups, catch_outcome=0, rule-flag
violations, multi-trip device-days)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.plans import (
    export as export_plan,
    merge_trips as mt,
    metrics as metrics_plan,
    preprocess as pre,
    validate as val,
)

RAW_COLS = [
    "submission_id",
    "group_general/landing_date",
    "group_general/today",
    "group_general/enumerator",
    "group_general/district",
    "group_general/district_palma",
    "group_general/district_mocimboa",
    "group_general/survey_activity",
    "group_general/catch_outcome",
    "group_general/location_coordinates",
    "group_trip/trip_duration",
    "group_trip/no_men_fishers",
    "group_trip/no_women_fishers",
    "group_trip/no_child_fishers",
    "group_trip/gear_type",
    "group_trip/habitat",
    "group_trip/hook_size",
    "group_trip/hook_size_other",
    "group_trip/boat_reg_no",
    "group_trip/pds_imei",
    "group_species/1/selected_species",
    "group_species/1/collection_type",
    "group_species/1/n_buckets",
    "group_species/1/weight_bucket",
    "group_species/1/catch_estimate",
    "group_species/1/no_individuals_5_10",
    "group_species/1/no_individuals_10_15",
    "group_species/2/selected_species",
    "group_species/2/collection_type",
    "group_species/2/n_buckets",
    "group_species/2/weight_bucket",
    "group_species/2/catch_estimate",
    "group_species/2/no_individuals_5_10",
    "group_species/2/no_individuals_10_15",
    "group_market/catch_price",
    "group_market/total_catch_value",
    "group_market/catch_use",
]


def _row(sid, **kw):
    base = {c: None for c in RAW_COLS}
    base.update(
        {
            "submission_id": sid,
            "group_general/landing_date": "2024-03-10 06:00:00",
            "group_general/today": "2024-03-10 18:00:00",
            "group_general/enumerator": "Joao da Silva",
            "group_general/district_palma": "palma",
            "group_general/survey_activity": "1",
            "group_general/catch_outcome": "1",
            "group_general/location_coordinates": "-10.5 40.2 12 4",
            "group_trip/trip_duration": "6",
            "group_trip/no_men_fishers": "2_",
            "group_trip/no_women_fishers": "1",
            "group_trip/gear_type": "handline",
            "group_trip/habitat": "1",
            "group_species/1/selected_species": "SNA",
            "group_species/1/collection_type": "1",
            "group_species/1/no_individuals_5_10": "4",
            # modeled catch for the default row is ~0.028 kg; keep the
            # price under the 2500 MZN/kg composite cap (flag 8)
            "group_market/catch_price": "50",
        }
    )
    base.update(kw)
    return tuple(base[c] for c in RAW_COLS)


@pytest.fixture(scope="module")
def raw(spark):
    schema = ", ".join(f"`{c}` string" for c in RAW_COLS)
    rows = [
        _row("s1"),
        _row("s2", **{"group_species/2/selected_species": "OCZ",
                      "group_species/2/collection_type": "1",
                      "group_species/2/no_individuals_10_15": "2",
                      "group_trip/pds_imei": "imei-1"}),
        # all-NA species group: only group 1 fields set to None
        _row("s3", **{"group_species/1/selected_species": None,
                      "group_species/1/collection_type": None,
                      "group_species/1/no_individuals_5_10": None,
                      "group_general/catch_outcome": "0"}),
        # rule violations: 70h trip, zero fishers, date order
        _row("s4", **{"group_trip/trip_duration": "70"}),
        _row("s5", **{"group_trip/no_men_fishers": "0",
                      "group_trip/no_women_fishers": "0"}),
        _row("s6", **{"group_general/landing_date": "2024-03-20 06:00:00",
                      "group_general/today": "2024-03-15 18:00:00"}),
        # bucket-fallback catch (no length bins)
        _row("s7", **{"group_species/1/no_individuals_5_10": None,
                      "group_species/1/n_buckets": "3",
                      "group_species/1/weight_bucket": "2.5",
                      "group_general/landing_date": "2024-05-02 06:00:00",
                      "group_general/today": "2024-05-02 19:00:00",
                      "group_general/district_palma": None,
                      "group_general/district_mocimboa": "mocimboa_da_praia"}),
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def lw_coeffs(spark):
    return spark.createDataFrame(
        [("SNA", 0.02, 2.9), ("OCZ", 0.5, 2.2)], "catch_taxon string, a double, b double"
    )


@pytest.fixture(scope="module")
def preprocessed(raw, lw_coeffs):
    return pre.preprocess_landings(raw, lw_coeffs).cache()


def test_preprocess_shapes_and_model(preprocessed):
    rows = {(r.submission_id, r.n_catch): r for r in preprocessed.collect()}
    # s1: one catch row from the 5_10 bin, modeled weight a*7.5^b*4/1000
    r = rows[("s1", 1)]
    assert r.catch_taxon == "SNA"
    assert abs(r.catch_kg - 0.02 * 7.5**2.9 * 4 / 1000) < 1e-9
    assert r.district == "Palma"
    assert r.n_fishers == 3.0  # "2_" + "1" + NA
    assert r.lat == -10.5 and r.habitat == "Reef"
    # s2: octopus group uses L/5.5
    r2 = rows[("s2", 2)]
    assert abs(r2.catch_kg - 0.5 * (12.5 / 5.5) ** 2.2 * 2 / 1000) < 1e-9
    # s3: all-NA species group -> no catch rows, but trip survives with catch zeroed
    assert ("s3", None) in rows and rows[("s3", None)].catch_kg == 0.0
    # s7: bucket fallback 3 * 2.5
    assert rows[("s7", 1)].catch_kg == 7.5


def test_validation_flags_and_exclusion(preprocessed):
    validated, flags = val.validate_surveys(preprocessed)
    flag_map = {r.submission_id: r.alert_flag for r in flags.collect()}
    assert "12" in (flag_map["s4"] or "").split(",")   # 70h trip
    assert "11" in (flag_map["s5"] or "").split(",")   # zero fishers, composite
    assert "13" in (flag_map["s6"] or "").split(",")   # submitted before landing
    assert flag_map["s1"] is None
    good_ids = {r.submission_id for r in validated.collect()}
    assert {"s4", "s5", "s6"}.isdisjoint(good_ids)
    assert "s1" in good_ids
    v1 = {r.submission_id: r for r in validated.collect()}["s1"]
    assert v1.cpue is not None and v1.price_per_kg is not None
    exploded = val.explode_flags(flags)
    assert exploded.filter(F.col("flag") == "12").count() == 1


def test_metrics_long_table(preprocessed):
    validated, _ = val.validate_surveys(preprocessed)
    catch = preprocessed.filter(F.col("catch_kg").isNotNull())
    out = metrics_plan.fishery_metrics(validated, catch)
    types = {r.metric_type for r in out.collect()}
    assert {"median_cpue", "total_catch_kg", "predominant_gear", "species_pct"} <= types


def test_export_branches(preprocessed):
    validated, _ = val.validate_surveys(preprocessed)
    mm = export_plan.monthly_metrics(validated)
    # March and May landings -> densified spine must include April NULLs
    months = {(r.district, str(r.month)) for r in mm.collect()}
    assert ("Palma", "2024-04-01") in months
    series = export_plan.habitat_gear_series(validated).collect()
    parsed = json.loads(series[0].series)
    assert parsed and set(parsed[0]) == {"x", "y"}


def test_merge_trips_conditional(spark, preprocessed):
    pds = spark.createDataFrame(
        [("t1", "imei-1", "2024-03-10 05:00:00", "2024-03-10 11:00:00")],
        "trip string, imei string, started string, ended string",
    ).withColumn("ended", F.to_timestamp("ended"))
    landings = preprocessed.select("submission_id", "landing_date", "pds_imei").distinct()
    merged = mt.merge_trips(pds, landings)
    hit = merged.filter(F.col("trip") == "t1").first()
    assert hit.submission_id == "s2"  # unique device-day joins 1:1


def test_composite_site_dim_join(spark, lw_coeffs):
    # J1 composite key (site_code, gaul_2_code): rows with both keys
    # matching enrich; others get NULL site
    cols = RAW_COLS + ["group_general/site_code", "group_general/gaul_2_code"]
    schema = ", ".join(f"`{c}` string" for c in cols)
    r1 = _row("sc1") + ("S01", "G01")
    r2 = _row("sc2") + ("S01", "G99")  # gaul mismatch -> no match
    raw = spark.createDataFrame([r1, r2], schema)
    sites = spark.createDataFrame(
        [("S01", "G01", "Palma Beach")],
        "site_code string, gaul_2_code string, site string",
    )
    out = pre.preprocess_landings(raw, lw_coeffs, dim_sites=sites)
    got = {r.submission_id: r.site for r in out.select("submission_id", "site").collect()}
    assert got["sc1"] == "Palma Beach"
    assert got["sc2"] is None


def test_over_bin_uses_measured_length(spark, lw_coeffs):
    # overNN bins use the MEASURED fish_length_overNN value when recorded,
    # the NN+2.5 midpoint otherwise (R/preprocessing-surveys.R:580-587)
    cols = RAW_COLS + [
        "group_species/1/no_individuals_over60",
        "group_species/1/fish_length_over60",
    ]
    schema = ", ".join(f"`{c}` string" for c in cols)
    r1 = _row("ov1") + ("1", "72")    # measured 72cm
    r2 = _row("ov2") + ("1", None)    # unmeasured -> 62.5 midpoint
    raw = spark.createDataFrame([r1, r2], schema)
    out = pre.preprocess_landings(raw, lw_coeffs)
    lens = {
        r.submission_id: r.length
        for r in out.filter(F.col("length_range") == "over60").collect()
    }
    assert lens == {"ov1": 72.0, "ov2": 62.5}


def test_export_taxa_length_branch(spark, preprocessed):
    # R/export.R:619-634: measured-length rows joined to the taxa dim
    taxa_dim = spark.createDataFrame(
        [("SNA", "Snapper"), ("OCZ", "Octopus"), ("TUN", "Tuna")],
        "scientific_name string, english_name string",
    )
    tl = export_plan.taxa_length(preprocessed, taxa_dim).collect()
    assert tl, "expected measured-length rows"
    # bucket-fallback rows (s7) have no length and must be excluded
    assert all(r.length_class is not None for r in tl)
    names = {r.catch_taxon for r in tl}
    assert names <= {"Snapper", "Octopus"}
    assert "Snapper" in names


def test_export_geo_region_product(spark, preprocessed):
    # R/export.R:711-746: per-site stats -> per-region medians -> left
    # attribute join onto the geo layer (regions without data keep NULLs)
    validated, _ = val.validate_surveys(preprocessed)
    stats = export_plan.per_site_stats(
        validated,
        ["district", "gear_type"],
        {"mean_cpue": F.avg("cpue")},
        min_submissions=0,
    )
    rollup = export_plan.region_median_rollup(stats, "district", ["mean_cpue"])
    geo = spark.createDataFrame(
        [("palma", '{"type":"Polygon"}'), ("quionga", '{"type":"Polygon"}')],
        "region string, geometry_json string",
    )
    out = export_plan.geo_region_indicators(geo, rollup)
    rows = {r.region: r for r in out.collect()}
    assert set(rows) == {"palma", "quionga"}
    assert rows["palma"].mean_cpue is not None and rows["palma"].n_submissions >= 3
    assert rows["quionga"].mean_cpue is None


def test_sites_stats_full_seven_stats(spark):
    # R/export.R:604-617: n + six means per (district, landing_site),
    # sample floor > min, null sites dropped; the exact-cents path must
    # agree with the float-avg path on cents-valued inputs
    rows = [
        ("Palma", "site_a", 2.0 + i % 3, 6.0, 10.5 + i, 0.5, 120.25, 20.0 + i)
        for i in range(5)
    ] + [
        ("Palma", None, 3.0, 6.0, 11.0, 0.5, 100.0, 25.0),      # null site
        ("Palma", "site_b", 3.0, 6.0, 11.0, 0.5, 100.0, 25.0),  # below floor
    ]
    trips = spark.createDataFrame(
        rows,
        "district string, landing_site string, n_fishers double, "
        "trip_duration double, catch_kg double, cpue double, "
        "price_per_kg double, rpue double",
    )
    out = {(r.district, r.landing_site): r
           for r in export_plan.sites_stats_full(trips).collect()}
    assert set(out) == {("Palma", "site_a")}
    r = out[("Palma", "site_a")]
    assert r.n_submissions == 5
    assert abs(r.n_fishers - (2 + 3 + 4 + 2 + 3) / 5) < 1e-12
    assert abs(r.mean_catch_kg - (10.5 + 11.5 + 12.5 + 13.5 + 14.5) / 5) < 1e-12
    assert abs(r.mean_catch_price_mzn - 120.25) < 1e-12
    exact = {(r.district, r.landing_site): r
             for r in export_plan.sites_stats_full(trips, exact_cents=True).collect()}
    e = exact[("Palma", "site_a")]
    for c in ("n_fishers", "trip_duration_hrs", "mean_catch_kg",
              "cpue_kg_fisher_hr", "mean_catch_price_mzn", "price_per_kg_mzn"):
        assert abs(getattr(e, c) - getattr(r, c)) < 1e-9, c


def test_full_pipeline_zone_dag(spark, raw, lw_coeffs, tmp_path):
    # the reference workflow DAG end-to-end through versioned zones:
    # each stage writes an immutable snapshot; re-running preprocess
    # adds a version and read_latest resolves it
    from peskas_mozambique_data_pipeline_spark.io import parquet_io
    from peskas_mozambique_data_pipeline_spark.plans import pipeline as pl

    pds = spark.createDataFrame(
        [("t1", "imei-1", "2024-03-10 05:00:00", "2024-03-10 11:00:00")],
        "trip string, imei string, started string, ended string",
    ).withColumn("ended", F.to_timestamp("ended"))

    zone_root = str(tmp_path / "zones")
    import os
    os.makedirs(zone_root)
    out = pl.run_full_pipeline(spark, raw, lw_coeffs, pds, zone_root, git_sha="aaa")
    assert set(out) == {
        "preprocessed", "validated", "flags", "trips_merged",
        "monthly_metrics", "sites_stats", "habitat_gear_series",
    }

    validated = spark.read.parquet(out["validated"])
    good = {r.submission_id for r in validated.collect()}
    assert "s1" in good and good.isdisjoint({"s4", "s5", "s6"})
    flags = spark.read.parquet(out["flags"])
    fm = {r.submission_id: r.alert_flag for r in flags.collect()}
    assert "12" in (fm["s4"] or "").split(",")
    merged = spark.read.parquet(out["trips_merged"])
    assert merged.filter(F.col("trip") == "t1").first().submission_id == "s2"
    mm = spark.read.parquet(out["monthly_metrics"])
    assert mm.count() > 0

    # idempotent re-run: new version written, read_latest flips to it
    import time as _time
    _time.sleep(1.1)  # version names are second-resolution
    zones = pl.PipelineZones(zone_root, "bbb")
    p2 = pl.stage_preprocess(spark, raw, lw_coeffs, zones)
    assert p2 != out["preprocessed"]
    assert parquet_io.latest_version_path(zone_root, "preprocessed") == p2


def test_zone_compact_keeps_dag_fresh(spark, raw, lw_coeffs, tmp_path):
    """Compaction in the live zone DAG: compacting a stage's zone lands
    a new version that read() resolves and that does NOT mark
    downstream products stale-by-content (it is the same data) — but
    is_fresh correctly reports downstream as older, so an orchestrator
    may choose to skip recompute after a pure compaction by comparing
    content, or simply re-run (idempotent either way)."""
    import os

    from peskas_mozambique_data_pipeline_spark.io import parquet_io
    from peskas_mozambique_data_pipeline_spark.plans import pipeline as pl

    zone_root = str(tmp_path / "zones_cmp")
    os.makedirs(zone_root)
    zones = pl.PipelineZones(zone_root, "aaa")
    p1 = pl.stage_preprocess(spark, raw, lw_coeffs, zones)
    before = zones.read(spark, "preprocessed")
    n_before = before.count()

    p2 = zones.compact(spark, "preprocessed", target_mb=128)
    assert p2 != p1
    assert parquet_io.latest_version_path(zone_root, "preprocessed") == p2
    after = zones.read(spark, "preprocessed")
    assert after.count() == n_before
    assert set(after.columns) == set(before.columns)
    n_files, _ = parquet_io.zone_file_stats(zone_root, "preprocessed")
    assert n_files == 1


def test_pipeline_skip_fresh_is_incremental(spark, raw, lw_coeffs, tmp_path):
    import os
    import time as _time

    from peskas_mozambique_data_pipeline_spark.plans import pipeline as pl

    zone_root = str(tmp_path / "zones_inc")
    os.makedirs(zone_root)
    out1 = pl.run_full_pipeline(spark, raw, lw_coeffs, None, zone_root, git_sha="aaa")
    # fresh re-run: every stage resolves to the EXISTING versions
    out2 = pl.run_full_pipeline(
        spark, raw, lw_coeffs, None, zone_root, git_sha="bbb", skip_fresh=True
    )
    assert out2 == out1  # nothing recomputed

    # a newer preprocessed version makes downstream stale again
    _time.sleep(1.1)
    zones = pl.PipelineZones(zone_root, "ccc")
    pl.stage_preprocess(spark, raw, lw_coeffs, zones)
    out3 = pl.run_full_pipeline(
        spark, raw, lw_coeffs, None, zone_root, git_sha="ddd", skip_fresh=True
    )
    assert out3["validated"] != out1["validated"]  # revalidated downstream


def test_pipeline_skip_fresh_rerun_on_partial_stage(spark, raw, lw_coeffs, tmp_path):
    # a prior run that died between a stage's writes leaves one product
    # fresh and a sibling missing: skip_fresh must re-run the stage,
    # not FileNotFoundError on the missing sibling
    import os
    import shutil

    from peskas_mozambique_data_pipeline_spark.plans import pipeline as pl

    zone_root = str(tmp_path / "zones_partial")
    os.makedirs(zone_root)
    out1 = pl.run_full_pipeline(spark, raw, lw_coeffs, None, zone_root, git_sha="aaa")

    # simulate the crash window: monthly_metrics written, siblings not
    for victim in ("sites_stats", "habitat_gear_series"):
        for d in os.listdir(zone_root):
            if d.startswith(f"{victim}__"):
                shutil.rmtree(os.path.join(zone_root, d))

    out2 = pl.run_full_pipeline(
        spark, raw, lw_coeffs, None, zone_root, git_sha="bbb", skip_fresh=True
    )
    # export stage re-ran: all three products exist again
    for p in ("monthly_metrics", "sites_stats", "habitat_gear_series"):
        assert os.path.isdir(out2[p]), p
    # upstream stages were genuinely skipped
    assert out2["preprocessed"] == out1["preprocessed"]
    assert out2["validated"] == out1["validated"]

    # same guard on the validate stage's (validated, flags) pair
    for d in os.listdir(zone_root):
        if d.startswith("flags__"):
            shutil.rmtree(os.path.join(zone_root, d))
    out3 = pl.run_full_pipeline(
        spark, raw, lw_coeffs, None, zone_root, git_sha="ccc", skip_fresh=True
    )
    assert os.path.isdir(out3["flags"])
    assert os.path.isdir(out3["validated"])
