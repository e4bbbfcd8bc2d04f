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
