"""ADNAP-form preprocessing tests: positional dotted repeat groups,
species-variant coalescing, timestamp-derived duration, over-100cm
extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.plans import preprocess_adnap as pa

COLS = [
    "submission_id",
    "_submitted_by",
    "provincia",
    "district_cabo",
    "fishing_start",
    "fishing_end",
    "boat_pds",
    "gear_type",
    "species_group.0.species_group/counting_method",
    "species_group.0.species_group/species_TL",
    "species_group.0.species_group/species_RF",
    "species_group.0.species_group/n_buckets",
    "species_group.0.species_group/weight_bucket",
    "species_group.0.species_group/catch_weight",
    "species_group.0.species_group/no_fish_by_length_group/no_individuals_5_10",
    "species_group.1.species_group/counting_method",
    "species_group.1.species_group/species_TL",
    "species_group.1.species_group/species_RF",
    "species_group.1.species_group/n_buckets",
    "species_group.1.species_group/weight_bucket",
    "species_group.1.species_group/catch_weight",
    "species_group.1.species_group/no_fish_by_length_group/no_individuals_5_10",
    "species_group/no_fish_by_length_group_100/fish_length_over100_1",
    "species_group/no_fish_by_length_group_100/fish_length_over100_2",
]


def _row(sid, **kw):
    base = {c: None for c in COLS}
    base.update({
        "submission_id": sid,
        "_submitted_by": "Maria Santos",
        "district_cabo": "mocimboa_da_praia",
        "fishing_start": "2024-02-01 04:30:00",
        "fishing_end": "2024-02-01 10:30:00",
        "boat_pds": "imei-9",
        "gear_type": "gillnet",
        "species_group.0.species_group/counting_method": "1",
        "species_group.0.species_group/species_TL": "SNA",
        "species_group.0.species_group/no_fish_by_length_group/no_individuals_5_10": "6",
    })
    base.update(kw)
    return tuple(base[c] for c in COLS)


@pytest.fixture(scope="module")
def raw(spark):
    schema = ", ".join(f"`{c}` string" for c in COLS)
    rows = [
        _row("a1"),
        # group 1 uses a VARIANT species column + direct catch_weight
        _row("a2", **{
            "species_group.1.species_group/counting_method": "3",
            "species_group.1.species_group/species_RF": "RAY",
            "species_group.1.species_group/catch_weight": "12.5",
        }),
        # over-100cm fish recorded by length
        _row("a3", **{
            "species_group/no_fish_by_length_group_100/fish_length_over100_1": "105",
            "species_group/no_fish_by_length_group_100/fish_length_over100_2": "118",
        }),
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def lw(spark):
    return spark.createDataFrame(
        [("SNA", 0.02, 2.9), ("RAY", 0.03, 2.8)],
        "catch_taxon string, a double, b double",
    )


def test_adnap_positional_melt_and_variants(raw, lw):
    out = pa.preprocess_landings_adnap(raw, lw)
    rows = {(r.submission_id, r.n_catch): r for r in out.collect()}
    # a1 group 0 -> n_catch 1, TL variant, modeled weight from 5_10 bin
    r = rows[("a1", 1)]
    assert r.catch_taxon == "SNA"
    assert abs(r.catch_kg - 0.02 * 7.5**2.9 * 6 / 1000) < 1e-9
    assert r.trip_duration == 6.0  # 04:30 -> 10:30
    assert r.district == "Mocimboa Da Praia"
    # a2 group 1 -> n_catch 2 via RF variant, direct catch_weight wins
    r2 = rows[("a2", 2)]
    assert r2.catch_taxon == "RAY"
    assert r2.catch_kg == 12.5


def test_adnap_over100_renumbered(raw, lw):
    out = pa.preprocess_landings_adnap(raw, lw)
    over = out.filter(
        (F.col("submission_id") == "a3") & F.col("length").isin(105.0, 118.0)
    ).collect()
    got = sorted((r.n_catch, r.length, r.n_individuals) for r in over)
    # base group occupies n_catch 1; over-100 rows continue 2, 3
    assert got == [(2, 105.0, 1.0), (3, 118.0, 1.0)]


def test_adnap_catch_weight_gated_on_counting_method(spark, lw):
    # catch_weight present but counting_method != "3": the direct weight
    # must NOT override the per-bin modeled weight (it would be
    # duplicated onto every exploded bin row otherwise)
    schema = ", ".join(f"`{c}` string" for c in COLS)
    raw = spark.createDataFrame(
        [_row("g1", **{"species_group.0.species_group/catch_weight": "99.0"})],
        schema,
    )
    out = pa.preprocess_landings_adnap(raw, lw)
    r = out.filter(F.col("n_catch") == 1).first()
    assert abs(r.catch_kg - 0.02 * 7.5**2.9 * 6 / 1000) < 1e-9  # modeled, not 99
