"""Salted two-stage aggregation + lang-id + embedding-dup operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickner_spark.operators import indexes as ix
from quickner_spark.operators import simsearch as ss
from quickner_spark.operators import textops as tx
from quickner_spark.operators.annotate import annotate_mentions, normalize_gazetteer

from tests.test_matcher import ENTITIES, TEXTS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mentions(spark):
    rows = [(str(i), t) for i, t in enumerate(TEXTS)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    return annotate_mentions(docs, normalize_gazetteer(ENTITIES)).cache()


def test_salted_equals_plain_entity_index(mentions):
    plain = {(r["surface"], r["n_docs"])
             for r in ix.entity_index(mentions).collect()}
    salted = {(r["surface"], r["n_docs"])
              for r in ix.entity_index_salted(mentions, buckets=4).collect()}
    assert salted == plain


def test_salted_distinct_count_vs_direct(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    direct = {(r["lang"], r["n"]) for r in
              docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n"))
              .collect()}
    salted = {(r["lang"], r["n_distinct"]) for r in
              ix.salted_distinct_count(docs, "lang", "doc_id", buckets=8)
              .collect()}
    assert salted == direct


def test_salted_plan_has_two_aggregate_stages(mentions):
    plan = (ix.entity_index_salted(mentions)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("Aggregate") >= 2  # partial-per-salt + final


def test_lang_id_deterministic_and_sane(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = tx.lang_id(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    # the corpus vocabulary contains 'the' and 'a' -> english profile hits
    langs = {r["lang_guess"] for r in rows}
    assert langs <= {"en", "und"}
    zero = [r for r in rows if r["lang_guess"] == "und"]
    assert all(r["lang_hits"] == 0 for r in zero)


def test_embedding_dup_pairs_threshold(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = ss.embedding_dup_pairs(emb, threshold_pct=40).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        # the integer inequality implies quantized cosine >= 0.4
        assert r["dot"] ** 2 * 10000 >= 1600 * r["n2_a"] * r["n2_b"]
    none = ss.embedding_dup_pairs(emb, threshold_pct=99).count()
    assert none == 0  # max cosine in this corpus ~0.51
