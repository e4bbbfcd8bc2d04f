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
    "entity_index_salted",
    "salted_distinct_count",
    "key_violations",
]


def key_violations(df: DataFrame, key_cols) -> DataFrame:
    """Primary-key audit: the keys appearing more than once, with their
    multiplicities — ``(key..., n_rows)``.

    The engine's table contract is that document/vector keys are UNIQUE,
    an invariant every ingest path establishes once (the texts loader's
    text-hash dedup, WARC's ``latest_by_url`` arg-max, ``Text``'s
    HashSet equality) rather than every query re-paying a defensive
    ``dropDuplicates`` shuffle. Violated-input behavior is therefore
    per-row (a duplicated key flows through per-row operators twice and
    inflates keyed aggregates); this audit is the cheap way to locate
    offending keys after ingesting an untrusted table — one partial
    aggregate, shuffle carries only (key, count) pairs, empty result ==
    contract holds."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
            .where(F.col("n_rows") > 1))


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


def salted_distinct_count(df: DataFrame, key, value_col: str,
                          out_col: str = "n_distinct",
                          buckets: int = 32) -> DataFrame:
    """Two-stage salted COUNT(DISTINCT value) GROUP BY key — the head-key
    skew pattern (north rule: head entities / hot domains).

    Salt = hash(value) % buckets, so every distinct value lands in exactly
    one (key, salt) cell: per-cell distinct counts SUM to the global
    distinct count with no overlap. Stage 1 spreads a hot key over
    ``buckets`` reducers; stage 2 combines ``buckets`` tiny rows per key.
    Identical results to a direct countDistinct (asserted in tests).
    """
    key_col = key if isinstance(key, str) else key
    stage1 = (df.withColumn("__salt", F.pmod(F.xxhash64(value_col), F.lit(buckets)))
              .groupBy(key_col, "__salt")
              .agg(F.countDistinct(value_col).alias("__pc")))
    name = key_col if isinstance(key_col, str) else "key"
    return (stage1.groupBy(name)
            .agg(F.sum("__pc").alias(out_col)))


def entity_index_salted(mentions: DataFrame, id_col: str = "doc_id",
                        buckets: int = 32) -> DataFrame:
    """A3 at web scale: surface -> distinct-doc count via salted two-stage
    aggregation. Head surfaces (the 'apple' problem) no longer serialize on
    one reducer."""
    keyed = mentions.select(F.lower("surface").alias("surface"), id_col)
    return salted_distinct_count(keyed, "surface", id_col, out_col="n_docs",
                                 buckets=buckets)


def entity_index(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A3 — lower(surface) -> distinct doc count. The reference keeps the
    full id list (quickner.rs:730-742); the count form is the stable,
    skew-safe aggregate (head entities produce huge lists otherwise —
    materialize the list only for tail keys if needed)."""
    return (mentions.groupBy(F.lower("surface").alias("surface"))
            .agg(F.countDistinct(id_col).alias("n_docs")))
