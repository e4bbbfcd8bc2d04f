"""Physical-plan audits: the properties that matter at 100 TB, asserted.

These tests pin the plan SHAPE (no shuffle in narrow stages, column
pruning into the scan, broadcast for small sides, partial aggregation)
so a regression that silently inserts an Exchange or drags unused columns
through Python fails CI.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    # Plan-shape assertions inspect the FileScan; a .cache()'d DataFrame
    # left behind by another module's fixture would make the CacheManager
    # substitute its full-schema InMemoryRelation into these plans and
    # hide the pruning under test.
    spark.catalog.clearCache()
    yield


def _executed(df) -> str:
    df.collect()  # ensure AQE final plan exists
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_mentions_plan_narrow_and_pruned(spark):
    df = E.q01_mentions(spark, SF)
    plan = _executed(df)
    # annotate itself is narrow: no KEYED shuffle anywhere in the plan (the
    # only allowed Exchange is the small-file round-robin spread, which is
    # a no-op at scale — see __spark_entry__._spread).
    assert "hashpartitioning" not in plan, "annotate must not key-shuffle"
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "roundrobin" in line.lower(), line
    assert "MapInPandas" in plan
    # column pruning: the parquet scan reads only (doc_id, text)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "lang" not in scan[0] and "source" not in scan[0]


def test_filter_pushdown_into_scan(spark):
    df = E.q06_filter_valid(spark, SF)
    plan = _executed(df)
    # isnotnull reaches the parquet scan as a pushed filter
    assert "PushedFilters: [IsNotNull(text)" in plan or \
           "PushedFilters: [ IsNotNull(text)" in plan or \
           "IsNotNull(text)" in plan


def test_knn_broadcasts_probes(spark):
    df = E.q11_knn_quantized_ip(spark, SF)
    plan = _executed(df)
    assert "Broadcast" in plan, "probe side must broadcast, never shuffle the big side"


def test_histogram_partial_aggregation(spark):
    df = E.q02_label_histogram(spark, SF)
    plan = _executed(df)
    # partial + final hash aggregate (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_triples_joins_on_doc_key(spark):
    df = E.q12_triples(spark, SF)
    plan = _optimized(df)
    assert "Join" in plan
    # predicate connective table is broadcast (tiny)
    ex = _executed(df)
    assert "Broadcast" in ex


def test_jaccard_no_cartesian(spark):
    df = E.q10_ngram_jaccard_pairs(spark, SF)
    plan = _optimized(df)
    assert "CartesianProduct" not in plan and "cartesian" not in plan.lower(), \
        "near-dup join must block on the shingle key, never cross-join"


def test_salted_index_spreads_key(spark):
    df = E.q19_salted_entity_index(spark, SF)
    plan = _optimized(df)
    assert "pmod" in plan and "xxhash64" in plan
    assert plan.count("Aggregate") >= 2


def test_annotate_documents_passthrough_prunes(spark):
    # multimodal rule: stages that don't need a column must not read it
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from quickner_spark.operators.annotate import annotate_mentions, normalize_gazetteer
    m = annotate_mentions(docs, normalize_gazetteer([("spark", "T")]))
    plan = _executed(m)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "n_chars" not in scan[0]


def test_annotate_over_pages_never_reads_html(spark, tmp_path):
    # The 100 TB claim: `html` is ~50x `text`; every post-extraction stage
    # over the pages table must prune it from the scan or the annotate
    # pass reads the whole corpus instead of ~2% of it (DESIGN_SCALE.md).
    from quickner_spark.kg import corpus
    from quickner_spark.operators.annotate import (annotate_mentions,
                                                   normalize_gazetteer)
    path = str(tmp_path / "pages")
    corpus.synth_pages(spark, 50, partitions=2).write.parquet(path)
    pages = spark.read.parquet(path)
    assert "html" in pages.columns  # the trap is actually present
    m = annotate_mentions(pages, normalize_gazetteer([("acme", "ORG")]),
                          id_col="url")
    plan = _executed(m)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "html" not in scan[0] and "warc_ts" not in scan[0], scan


def test_link_scores_plan_broadcasts_and_no_cartesian(spark):
    df = E.q27_link_scores(spark, SF)
    plan = _executed(df)
    assert "BroadcastHashJoin" in plan          # alias table + vocab sides
    assert "CartesianProduct" not in plan
    assert "hashpartitioning" in plan           # the (doc, alias) argmax agg


def test_kg_edges_plan_broadcasts_maps(spark):
    df = E.q28_kg_edges(spark, SF)
    plan = _executed(df)
    assert plan.count("BroadcastHashJoin") >= 2  # subj and obj alias maps
    assert "CartesianProduct" not in plan
