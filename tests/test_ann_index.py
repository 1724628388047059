"""Persistent IVF index zone (operators/ann_index.py): save/load
round-trip, frozen-centroid incremental add, compaction, and the
partition-pruned probe read."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import parquet_io
from peskas_mozambique_data_pipeline_spark.operators import ann_index
from peskas_mozambique_data_pipeline_spark.operators import similarity as sim_ops
from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones
import pytest

SF = "/root/testdata/sf0.001"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_save_load_probe_round_trip(spark, tmp_path):
    emb = _emb(spark)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(emb, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)

    in_memory = sim_ops.ivf_topk(_queries(emb), assignments, centroids, k=5, n_probe=2)
    from_zone = ann_index.ivf_topk_from_zone(spark, zones, _queries(emb), k=5, n_probe=2)
    assert rows(from_zone) == rows(in_memory)


@pytest.mark.slow
def test_incremental_add_matches_frozen_rebuild(spark, tmp_path):
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    zones = PipelineZones(str(tmp_path))

    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)
    ann_index.append_ivf_vectors(spark, zones, extra)

    # frozen-centroid ground truth: assign the FULL corpus to the
    # base-trained centroids with the shared assignment rule
    full_assign = sim_ops.assign_to_centroids(emb, centroids)
    assert rows(
        ann_index.load_ivf_postings(spark, zones).select("vec_id", "centroid_id")
    ) == rows(full_assign.select("vec_id", "centroid_id"))

    expected = sim_ops.ivf_topk(_queries(emb), full_assign, centroids, k=5, n_probe=2)
    got = ann_index.ivf_topk_from_zone(spark, zones, _queries(emb), k=5, n_probe=2)
    assert rows(got) == rows(expected)


@pytest.mark.slow
def test_compaction_folds_deltas_and_preserves_results(spark, tmp_path):
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 400)
    extra1 = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    extra2 = emb.filter(F.col("vec_id") >= 450)
    zones = PipelineZones(str(tmp_path))

    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)
    ann_index.append_ivf_vectors(spark, zones, extra1)
    ann_index.append_ivf_vectors(spark, zones, extra2)
    assert len(ann_index._delta_paths(zones, "ann_ivf")) == 2

    before = rows(ann_index.ivf_topk_from_zone(spark, zones, _queries(emb)))
    ann_index.compact_ivf_index(spark, zones)

    # deltas folded + removed; exactly one postings snapshot survives
    assert ann_index._delta_paths(zones, "ann_ivf") == []
    assert len(parquet_io.list_versions(str(tmp_path), "ann_ivf_postings")) == 1
    assert rows(ann_index.ivf_topk_from_zone(spark, zones, _queries(emb))) == before
    # and the folded snapshot is row-identical to a frozen rebuild
    assert rows(
        ann_index.load_ivf_postings(spark, zones).select("vec_id", "centroid_id")
    ) == rows(sim_ops.assign_to_centroids(emb, centroids).select("vec_id", "centroid_id"))


def test_probe_read_prunes_unprobed_partitions(spark, tmp_path):
    emb = _emb(spark)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(emb, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)

    pruned = ann_index.load_ivf_postings(spark, zones, centroid_ids=[0, 2])
    plan = _plan_of(pruned)
    seg = plan.split("PartitionFilters")[1][:200]
    assert "centroid_id" in seg
    # the pruned scan must really skip the other inverted lists
    found = {r["centroid_id"] for r in pruned.select("centroid_id").distinct().collect()}
    assert found <= {0, 2}


def test_int8_zone_full_probe_equals_brute_int8(spark, tmp_path):
    """With n_probe == C the quantized-zone tier must be row-identical
    to brute-force cosine_topk_int8 over the same quantization — the
    probe tier adds routing, never a different scorer."""
    emb = _emb(spark)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(emb, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index_int8(zones, assignments, centroids)

    got = ann_index.ivf_topk_int8_from_zone(
        spark, zones, _queries(emb), k=5, n_probe=4
    )
    q8 = sim_ops.quantize_embeddings_int8(_queries(emb).select("query_id", "embedding"))
    c8 = sim_ops.quantize_embeddings_int8(emb)
    expected = sim_ops.cosine_topk_int8(q8, c8, k=5)
    assert rows(got) == rows(expected)


def test_int8_zone_probe_prunes_and_ranks(spark, tmp_path):
    """At n_probe < C the read is partition-pruned and results stay
    well-formed (per-query dense ranks, k rows)."""
    emb = _emb(spark)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(emb, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index_int8(zones, assignments, centroids)

    got = ann_index.ivf_topk_int8_from_zone(
        spark, zones, _queries(emb), k=5, n_probe=2
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= 5


def test_ivfpq_zone_matches_in_job_tier(spark, tmp_path):
    """The persisted IVF+PQ index (wide codes pre-joined to their
    inverted list) must reproduce similarity.ivfpq_topk row-for-row
    over the same built index — the zone changes layout, not scoring
    (same fixed-order ADC chain)."""
    emb = _emb(spark)
    queries = _queries(emb)
    zones = PipelineZones(str(tmp_path))
    ivf_assign, ivf_cents = sim_ops.build_ivf_index(emb, n_centroids=8, n_iters=2)
    pq_codes, pq_books = sim_ops.build_pq_index(emb, m=2, k=4, n_iters=2, dim=64)

    ann_index.save_ivfpq_index(zones, ivf_assign, ivf_cents, pq_codes, pq_books)
    got = ann_index.ivfpq_topk_from_zone(
        spark, zones, queries, k_nn=5, n_probe=2, m=2, k=4, dim=64
    )
    expected = sim_ops.ivfpq_topk(
        queries, ivf_assign, ivf_cents, pq_codes, pq_books,
        k_nn=5, n_probe=2, m=2, k=4, dim=64,
    )
    assert rows(got) == rows(expected)


@pytest.mark.slow
def test_ivfpq_append_matches_frozen_rebuild(spark, tmp_path):
    """Frozen-structure IVF+PQ appends: base index built on part of the
    corpus, the rest appended; the zone must equal a from-scratch
    ENCODE of the full corpus under the SAME centroids/codebooks (the
    FAISS add semantics), and the probe must see appended vectors both
    before and after compaction."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    queries = _queries(emb)
    zones = PipelineZones(str(tmp_path))
    ivf_assign, ivf_cents = sim_ops.build_ivf_index(base, n_centroids=8, n_iters=2)
    pq_codes, pq_books = sim_ops.build_pq_index(base, m=2, k=4, n_iters=2, dim=64)
    ann_index.save_ivfpq_index(zones, ivf_assign, ivf_cents, pq_codes, pq_books)

    ann_index.append_ivfpq_vectors(spark, zones, extra, m=2, dim=64)

    # expected: encode the FULL corpus under the same frozen structures
    full_assign = sim_ops.assign_to_centroids(emb, ivf_cents)
    full_codes = sim_ops.pq_encode(emb, pq_books, m=2, dim=64)
    got_members = rows(
        ann_index.load_ivf_postings(spark, zones, "ann_ivfpq").select(
            "vec_id", "centroid_id"
        )
    )
    assert got_members == rows(full_assign.select("vec_id", "centroid_id"))
    expected = sim_ops.ivfpq_topk(
        queries, full_assign, ivf_cents, full_codes, pq_books,
        k_nn=5, n_probe=2, m=2, k=4, dim=64,
    )
    got = ann_index.ivfpq_topk_from_zone(
        spark, zones, queries, k_nn=5, n_probe=2, m=2, k=4, dim=64
    )
    assert rows(got) == rows(expected)

    # compaction folds the delta; results identical afterwards
    ann_index.compact_ivf_index(spark, zones, prefix="ann_ivfpq")
    assert ann_index._delta_paths(zones, "ann_ivfpq") == []
    got2 = ann_index.ivfpq_topk_from_zone(
        spark, zones, queries, k_nn=5, n_probe=2, m=2, k=4, dim=64
    )
    assert rows(got2) == rows(expected)


def test_pq_encode_matches_build_final_assignment(spark):
    """pq_encode under the build's own codebooks must reproduce the
    build's final assignment exactly — the frozen-encode rule IS the
    build's last pass."""
    emb = _emb(spark)
    codes, books = sim_ops.build_pq_index(emb, m=2, k=4, n_iters=2, dim=64)
    re_encoded = sim_ops.pq_encode(emb, books, m=2, dim=64)
    assert rows(codes.select("vec_id", "subspace", "code")) == rows(
        re_encoded.select("vec_id", "subspace", "code")
    )


def test_int8_append_matches_frozen_rebuild(spark, tmp_path):
    """int8 IVF appends: per-vector symmetric quantization is
    row-independent, so base+append must equal a from-scratch quantize
    of the full corpus under the same frozen centroids — probed results
    identical before and after compaction."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    queries = _queries(emb)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index_int8(zones, assignments, centroids)

    ann_index.append_ivf_vectors_int8(spark, zones, extra)

    full_assign = sim_ops.assign_to_centroids(emb, centroids)
    zone_members = rows(
        ann_index.load_ivf_postings(spark, zones, "ann_ivf8").select(
            "vec_id", "centroid_id"
        )
    )
    assert zone_members == rows(full_assign.select("vec_id", "centroid_id"))

    before = rows(
        ann_index.ivf_topk_int8_from_zone(spark, zones, queries, k=5, n_probe=2)
    )
    ann_index.compact_ivf_index(spark, zones, prefix="ann_ivf8")
    assert ann_index._delta_paths(zones, "ann_ivf8") == []
    after = rows(
        ann_index.ivf_topk_int8_from_zone(spark, zones, queries, k=5, n_probe=2)
    )
    assert before == after


def test_embedding_drift_occupancy(spark):
    """embedding_drift: exact occupancy shares against shared
    centroids; identical corpora -> zero drift; a skewed slice moves
    the deltas where the slice lives."""
    emb = _emb(spark)
    _, cents = sim_ops.build_ivf_index(emb, n_centroids=4, n_iters=2)

    same = sim_ops.embedding_drift(emb, emb, cents)
    rows = same.collect()
    assert all(r["delta_nano"] == 0 for r in rows)
    assert all(r["n_old"] == r["n_new"] for r in rows)
    assert len(rows) == 4  # every centroid has a row

    # drop one centroid's members from "new": its share must fall and
    # the counts must say exactly which
    assigned = sim_ops.assign_to_centroids(emb, cents)
    victim = int(assigned.groupBy("centroid_id").count()
                 .orderBy(F.col("count").desc()).first()["centroid_id"])
    keep_ids = assigned.filter(F.col("centroid_id") != victim).select("vec_id")
    new = emb.join(keep_ids, "vec_id")
    moved = {r["centroid_id"]: r for r in
             sim_ops.embedding_drift(emb, new, cents).collect()}
    assert moved[victim]["n_new"] == 0
    assert moved[victim]["delta_nano"] < 0
    others = [v["delta_nano"] for k, v in moved.items() if k != victim]
    assert all(d >= 0 for d in others)
    # shares are exact nano integers that sum to ~1 on each side
    tot_new = sum(v["share_new_nano"] for v in moved.values())
    assert 10**9 - 4 <= tot_new <= 10**9
