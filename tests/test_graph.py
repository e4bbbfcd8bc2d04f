"""Connected-components loop unit tests (chain, cycle, star, singletons)."""

from __future__ import annotations

import pytest

from quickner_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["component"]
            for r in connected_components(df).collect()}


def test_chain_converges_beyond_one_hop(spark):
    # a-b-c-d-e: min label must propagate the full diameter
    got = _cc(spark, [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")])
    assert got == {k: "a" for k in "abcde"}


def test_cycle(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_two_components_and_star(spark):
    got = _cc(spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3"),
                      ("x", "y")])
    assert got["s1"] == got["s2"] == got["s3"] == got["hub"] == "hub"
    assert got["x"] == got["y"] == "x"


def test_numeric_ids_and_self_loop(spark):
    df = spark.createDataFrame([(5, 2), (2, 9), (7, 7)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 7: 7}


def test_distributed_path_matches_driver_fast_path(spark):
    # Same graphs through BOTH implementations (driver_threshold=0 forces
    # the iterative min-label loop); outputs must be row-identical.
    import random
    rng = random.Random(7)
    edges = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
             for _ in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {(r["node"], r["component"])
            for r in connected_components(df).collect()}
    dist = {(r["node"], r["component"])
            for r in connected_components(df, driver_threshold=0).collect()}
    assert fast == dist and fast


def test_driver_threshold_picks_fast_path(spark):
    # below threshold: exactly one job (the count) runs; assert the result
    # is correct and no shuffle-bearing plan was needed by checking the
    # chain still fully converges (union-find has no iteration cap)
    chain = [(f"c{i+1:03d}", f"c{i:03d}") for i in range(120)]
    df = spark.createDataFrame(chain, "src string, dst string")
    got = {r["node"]: r["component"]
           for r in connected_components(df, max_iter=1).collect()}
    # max_iter=1 would NOT converge in the distributed loop for a
    # 120-diameter chain -> proves the fast path ran
    assert set(got.values()) == {"c000"}


def test_min_id_components_normalizes_generated_ids(spark):
    # GraphFrames emits generated LONG component ids; the contract is
    # component = min member node id in the node's own type. Simulate its
    # output shape and assert the normalizer restores the contract.
    from quickner_spark.operators.graph import _min_id_components

    cc = spark.createDataFrame(
        [("doc9", 71001), ("doc2", 71001), ("doc5", 71001),
         ("zzz", 3), ("aaa", 3)],
        "id string, component long")
    got = {r["node"]: r["component"] for r in _min_id_components(cc).collect()}
    assert got == {"doc9": "doc2", "doc2": "doc2", "doc5": "doc2",
                   "zzz": "aaa", "aaa": "aaa"}


def test_sparse_convergence_check_matches_every_round(spark):
    # check_every=3 saves 2 join+count actions per skipped round; the
    # labeling must be identical to per-round checking (propagation past
    # the fixpoint is a no-op).
    chain = [(f"n{i+1:02d}", f"n{i:02d}") for i in range(17)]
    df = spark.createDataFrame(chain, "src string, dst string")
    every = {(r["node"], r["component"]) for r in
             connected_components(df, driver_threshold=0,
                                  check_every=1).collect()}
    sparse = {(r["node"], r["component"]) for r in
              connected_components(df, driver_threshold=0,
                                   check_every=3).collect()}
    assert every == sparse and every
