"""End-to-end golden test of the distributed annotate stage (EP1 shape):
documents DF + gazetteer -> broadcast automaton -> mapInPandas -> mentions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from quickner_spark.operators.annotate import (annotate_documents,
                                               annotate_mentions,
                                               normalize_gazetteer)

from tests.test_matcher import ENTITIES, GOLDEN, TEXTS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=str(i), text=t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def mentions(spark, docs):
    gaz = normalize_gazetteer(ENTITIES, case_sensitive=False)
    m = annotate_mentions(docs, gaz, id_col="doc_id", text_col="text",
                          case_sensitive=False)
    m.cache()
    return m


def test_golden_total_count(mentions):
    assert mentions.count() == 12  # tests/test.py:58-59


def test_golden_exact_spans(mentions):
    got = {
        doc_id: sorted((r["start"], r["end"], r["label"])
                       for r in rows)
        for doc_id, rows in (
            (k, list(v)) for k, v in
            ((r[0], r[1]) for r in
             mentions.groupBy("doc_id")
             .agg(F.collect_list(F.struct("start", "end", "label")).alias("spans"))
             .select("doc_id", "spans").collect())
        )
    }
    for i, text in enumerate(TEXTS):
        key = text.lower()
        if key in GOLDEN:
            assert got[str(i)] == GOLDEN[key]


def test_label_histogram(mentions):
    hist = {r["label"]: r["n"] for r in
            mentions.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert hist == {"PL": 6, "ORG": 3, "PERSON": 3}


def test_docs_by_label_counts(mentions):
    # tests/test.py:78-83 — distinct docs per label
    per_label = {r["label"]: r["n"] for r in
                 mentions.groupBy("label")
                 .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert per_label == {"PL": 5, "ORG": 3, "PERSON": 3}


def test_docs_by_entity_counts(mentions):
    # tests/test.py:122-141 — "Rust" in 2 docs, all others in 1
    per_surface = {r["surface"]: r["n"] for r in
                   mentions.groupBy(F.lower("surface").alias("surface"))
                   .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert per_surface["rust"] == 2
    for name, _ in ENTITIES:
        if name != "Rust":
            assert per_surface[name.lower()] == 1


def test_doc_level_annotate_lowercases_text(spark, docs):
    gaz = normalize_gazetteer(ENTITIES, case_sensitive=False)
    out = annotate_documents(docs, gaz, case_sensitive=False)
    rows = {r["doc_id"]: r for r in out.collect()}
    # reference batch process() mutates stored text (quickner.rs:267-270)
    assert rows["1"]["text"] == TEXTS[1].lower()
    spans = [(s["start"], s["end"], s["label"]) for s in rows["1"]["label"]]
    assert spans == GOLDEN[TEXTS[1].lower()]


def test_case_sensitive_mentions(spark, docs):
    gaz = normalize_gazetteer(ENTITIES, case_sensitive=True)
    m = annotate_mentions(docs, gaz, case_sensitive=True)
    # doc 0 "rust is made by Mozilla": only Mozilla matches case-sensitively
    got = [(r["start"], r["end"], r["label"])
           for r in m.where(F.col("doc_id") == "0").collect()]
    assert got == [(16, 23, "ORG")]


def test_no_shuffle_in_annotate_plan(docs):
    gaz = normalize_gazetteer(ENTITIES)
    m = annotate_mentions(docs, gaz)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map: no shuffle
