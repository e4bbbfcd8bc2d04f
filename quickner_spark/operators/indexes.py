"""Aggregations and lookup queries over the mentions table (A1-A3, Q1-Q2).

The reference materializes two inverted indexes eagerly after annotation
(documents_label_index quickner.rs:719-728, documents_entities_index
quickner.rs:730-742) plus a PK hash map. Spark-natively these are lazy
aggregations/joins over the normalized ``mentions`` DataFrame — Catalyst
turns the point lookups into broadcast-hash semi-joins and the histograms
into partial+final hash aggregates (map-side combine for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "label_histogram",
    "docs_by_label",
    "docs_by_entity",
    "label_index",
    "entity_index",
]


def label_histogram(mentions: DataFrame) -> DataFrame:
    """A1 — annotations per label (reference __repr__ fold,
    src/pyquickner.rs:153-181). Partial aggregation happens map-side; the
    shuffle moves only (label, count) pairs."""
    return mentions.groupBy("label").agg(F.count("*").alias("n_mentions"))


def docs_by_label(mentions: DataFrame, label: str, id_col: str = "doc_id") -> DataFrame:
    """Q1 — find_documents_by_label (src/pyquickner.rs:297-327): exact,
    case-SENSITIVE label key -> distinct doc ids. Join the result back to
    the documents table for full rows; at scale that join broadcasts the
    (small) id set."""
    return (mentions.where(F.col("label") == F.lit(label))
            .select(id_col).distinct())


def docs_by_entity(mentions: DataFrame, name: str, id_col: str = "doc_id") -> DataFrame:
    """Q2 — find_documents_by_entity (src/pyquickner.rs:329-360): query is
    lowercased, surface keys are lowercased (README.md:120-141: entity
    lookup is case-insensitive; label lookup is not)."""
    return (mentions.where(F.lower("surface") == F.lit(name.lower()))
            .select(id_col).distinct())


def label_index(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A2 — label -> sorted distinct doc ids (materialized form)."""
    return (mentions.groupBy("label")
            .agg(F.sort_array(F.collect_set(id_col)).alias(f"{id_col}s")))


def entity_index(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A3 — lower(surface) -> distinct doc count. The reference keeps the
    full id list (quickner.rs:730-742); the count form is the stable,
    skew-safe aggregate (head entities produce huge lists otherwise —
    materialize the list only for tail keys if needed)."""
    return (mentions.groupBy(F.lower("surface").alias("surface"))
            .agg(F.countDistinct(id_col).alias("n_docs")))
