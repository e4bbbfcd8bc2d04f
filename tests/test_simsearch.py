"""Similarity-search operator tests: exact baselines + LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quickner_spark.operators import simsearch as ss

SF = "/root/testdata/sf0.001"
PROBES = [0, 1, 2]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_quantized_ip_matches_local_numpy(spark, emb):
    import numpy as np

    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = ss.topk_quantized_ip(emb, k=5, probe_ids=[0]).collect()
    q = {k: np.round(v * 1000).astype(np.int64) for k, v in rows.items()}
    scores = sorted(((int(q[0] @ q[j]), j) for j in q if j != 0),
                    key=lambda t: (-t[0], t[1]))[:5]
    expect = [(j, r + 1, s) for r, (s, j) in enumerate(scores)]
    assert [(r["neighbor_id"], r["rank"], r["score"]) for r in
            sorted(got, key=lambda r: r["rank"])] == expect


def test_cosine_topk_sane(emb):
    got = ss.cosine_topk(emb, k=5, probe_ids=PROBES)
    rows = got.collect()
    assert len(rows) == len(PROBES) * 5
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)


def test_lsh_recall_vs_exact(emb):
    exact = {(r["probe_id"], r["neighbor_id"])
             for r in ss.cosine_topk(emb, k=5, probe_ids=PROBES).collect()}
    # random 64-dim embeddings have near-orthogonal neighbors: per-table
    # bucket-collision prob ~ 0.62^planes, recall ~ 1-(1-p)^tables.
    # 4 planes x 16 tables => ~0.9 expected; assert with slack.
    approx = {(r["probe_id"], r["neighbor_id"])
              for r in ss.lsh_topk(emb, k=5, probe_ids=PROBES,
                                   n_planes=4, n_tables=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # approximate by design; catches breakage


def test_lsh_deterministic(emb):
    a = sorted(map(tuple, ss.lsh_topk(emb, k=3, probe_ids=[0]).collect()))
    b = sorted(map(tuple, ss.lsh_topk(emb, k=3, probe_ids=[0]).collect()))
    assert a == b


def test_ivf_recall_on_clustered_data(spark):
    # IVF's contract is cell locality: on clustered data a probe's true
    # neighbors share its cell, so recall ~ 1 with small nprobe. (Random
    # uniform vectors would make any IVF scan ~nprobe/nlist of the data —
    # not a meaningful recall test.)
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(25):
            v = centers[c] + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = [0, 25, 50]
    exact = {(r["probe_id"], r["neighbor_id"])
             for r in ss.cosine_topk(emb, k=5, probe_ids=probes).collect()}
    approx = {(r["probe_id"], r["neighbor_id"])
              for r in ss.ivf_topk(emb, k=5, probe_ids=probes,
                                   nlist=8, nprobe=2, iters=2).collect()}
    assert len(exact & approx) / len(exact) >= 0.9


def test_ivf_deterministic(emb):
    a = sorted(map(tuple, ss.ivf_topk(emb, k=3, probe_ids=[0],
                                      nlist=8, nprobe=3).collect()))
    b = sorted(map(tuple, ss.ivf_topk(emb, k=3, probe_ids=[0],
                                      nlist=8, nprobe=3).collect()))
    assert a == b


def test_lsh_dup_pairs_subset_and_recall(emb):
    """The LSH-bucketed near-dup scale path: every emitted pair must pass
    the SAME integer predicate as the exact operator (precision 1.0 —
    exact subset), and with 16 tables recall over the exact pair set is
    high on this corpus."""
    exact = {(r["id_a"], r["id_b"])
             for r in ss.embedding_dup_pairs(emb, threshold_pct=40).collect()}
    approx_rows = ss.lsh_dup_pairs(emb, threshold_pct=40, n_planes=4,
                                   n_tables=16).collect()
    approx = {(r["id_a"], r["id_b"]) for r in approx_rows}
    assert approx <= exact                     # verified => subset
    assert exact, "fixture must produce exact pairs"
    recall = len(approx) / len(exact)
    assert recall >= 0.7, recall
    # emitted payload matches the exact operator's row for the same pair
    exact_rows = {(r["id_a"], r["id_b"]): (r["dot"], r["n2_a"], r["n2_b"])
                  for r in ss.embedding_dup_pairs(emb, threshold_pct=40).collect()}
    for r in approx_rows:
        assert exact_rows[(r["id_a"], r["id_b"])] == (r["dot"], r["n2_a"], r["n2_b"])


def test_embedding_dup_pairs_block_invariant(emb):
    """The distributed block-pair GEMM must emit the identical pair set
    for any block count (each unordered pair lands in exactly one
    (bi, bj) group), including n_blocks=1 (single all-pairs GEMM)."""
    base = sorted(map(tuple,
                      ss.embedding_dup_pairs(emb, threshold_pct=40,
                                             n_blocks=8).collect()))
    for nb in (1, 3):
        got = sorted(map(tuple,
                         ss.embedding_dup_pairs(emb, threshold_pct=40,
                                                n_blocks=nb).collect()))
        assert got == base, nb
    assert base, "fixture must produce pairs"
    for t in base:
        assert t[0] < t[1]  # canonical orientation


def test_embedding_dup_pairs_no_driver_collect(emb):
    """The exact near-dup operator must stay lazy — building the plan may
    not run a job (the old implementation collected the full table to the
    driver at plan-build time)."""
    tracker = emb.sparkSession.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = ss.embedding_dup_pairs(emb, threshold_pct=40)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction triggered a job"
    assert df.count() >= 0


def test_lsh_bucket_cap_drops_degenerate_buckets(spark, emb):
    """max_bucket is the LSH skew guard (same idea as the shingle
    doc_freq_cap): a degenerate signature shared by the whole corpus may
    not go quadratic. Identical vectors collide in every table; a cap
    below the corpus size drops those buckets entirely, and the default
    cap (10k) never triggers at test scale — outputs unchanged."""
    rows = [(i, [1.0] * 16) for i in range(50)]  # one bucket per table
    degen = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert ss.lsh_dup_pairs(degen, threshold_pct=40, max_bucket=10).count() == 0
    assert ss.lsh_topk(degen, probe_ids=[0], max_bucket=10).count() == 0
    # uncapped, the identical vectors are all pairwise dups / neighbors
    assert ss.lsh_dup_pairs(degen, threshold_pct=40,
                            max_bucket=None).count() == 50 * 49 // 2
    # default cap is invisible on the real fixture
    a = sorted(map(tuple, ss.lsh_dup_pairs(emb, threshold_pct=40).collect()))
    b = sorted(map(tuple, ss.lsh_dup_pairs(emb, threshold_pct=40,
                                           max_bucket=None).collect()))
    assert a == b


def test_lsh_ops_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ss.lsh_dup_pairs(empty).count() == 0
    assert ss.lsh_topk(empty, probe_ids=[0]).count() == 0
    assert ss.embedding_dup_pairs(empty).count() == 0


def test_ivf_portable_recall_and_determinism(spark):
    """The PORTABLE IVF (md5 seeds, integer centroids/distances,
    quantized-cosine scores — the q24 oracle mode) must keep the cell-
    locality contract on clustered data and be run-to-run deterministic.
    Clustered fixture mirrors test_ivf_recall_on_clustered_data."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(6, 32))
    rows = []
    for i in range(90):
        c = centers[i % 6]
        rows.append((i, (c + 0.05 * rng.normal(size=32)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = [0, 25, 50]
    exact = {(r["probe_id"], r["neighbor_id"])
             for r in ss.cosine_topk(emb, k=5, probe_ids=probes).collect()}
    a = ss.ivf_topk(emb, k=5, probe_ids=probes, nlist=8, nprobe=2,
                    iters=2, hash_family="portable").collect()
    approx = {(r["probe_id"], r["neighbor_id"]) for r in a}
    assert len(exact & approx) / len(exact) >= 0.9
    b = ss.ivf_topk(emb, k=5, probe_ids=probes, nlist=8, nprobe=2,
                    iters=2, hash_family="portable").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # scores are the integer-exact quantized cosine: within float tolerance
    # of the true cosine on these vectors
    for r in a:
        assert -1.01 <= r["cosine"] <= 1.01


def test_ivf_unknown_hash_family_raises(emb):
    with pytest.raises(ValueError, match="hash_family"):
        ss.ivf_topk(emb, probe_ids=[0], hash_family="nope")
