"""Triple extraction: (subj, pred, obj) from co-occurring mentions.

North-rule stage (BASELINE.json north_star): pattern-based SVO extraction
over annotated sentences. The engine primitive is a *mention-pair pattern
join*: two mentions of the same document linked by a predicate expression
that must match the text between them.

Plan shape: mentions × predicates (broadcast fan-out, |preds| rows per
mention) -> EQUI-join against mentions on (doc_id, expected object offset)
-> join back to ``documents`` for the connecting-text check. Both mention
sides shuffle once on the same composite key; fan-out is limited to actual
positional hits (no per-document mention² cross product); the documents
join ships only (doc_id, text).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["adjacent_pattern_triples", "pattern_triples"]


def adjacent_pattern_triples(*args, **kwargs) -> DataFrame:
    """Triples from the exact pattern ``<subj mention> <pred> <obj mention>``
    with single-space separation. Alias of :func:`pattern_triples` —
    returns (doc_id, subj, pred, obj, subj_start, obj_start); provenance
    columns keep triple-level P/R auditable per doc/url."""
    return pattern_triples(*args, **kwargs)


def pattern_triples(
    mentions: DataFrame,
    documents: DataFrame,
    predicates: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    lower_text: bool = True,
) -> DataFrame:
    """General mention-pair + connecting-token triple extraction.

    A triple fires when ``text[subj.end] == ' '``, the predicate token
    occupies ``text[subj.end+1 : subj.end+1+len(pred)]``, followed by one
    space, and the object mention starts exactly after it.
    """
    spark = mentions.sparkSession
    pred_df = F.broadcast(spark.createDataFrame(
        [(p, len(p)) for p in predicates], "pred string, plen int"))
    m1 = mentions.select(F.col(id_col).alias("__id"),
                         F.col("start").alias("subj_start"),
                         F.col("end").alias("subj_end"),
                         F.col("surface").alias("subj"))
    m2 = mentions.select(F.col(id_col).alias("__id"),
                         F.col("start").alias("obj_start"),
                         F.col("surface").alias("obj"))
    text = F.lower(F.col(text_col)) if lower_text else F.col(text_col)
    docs = documents.select(F.col(id_col).alias("__id"), text.alias("__text"))
    # (subj x predicate) is a cheap broadcast fan-out (|preds| rows per
    # mention); the expensive mention-mention match is then an EQUI-join on
    # (doc, exact expected object offset) — no per-document mention² cross
    # product with a post-filter, so fan-out is only actual positional hits.
    # Both the mention-mention equi-join and the documents join are pinned
    # to sort-merge: every side is corpus-sized, but compressed-parquet
    # stats under-estimate them and Spark would otherwise broadcast the
    # full mention/document table (serial driver collect+hash — measured
    # as the stage's dominant, non-scaling cost; OOM at corpus scale).
    m1p = (m1.crossJoin(pred_df)
           .withColumn("obj_start", F.col("subj_end") + 2 + F.col("plen")))
    out = (m1p.join(m2.hint("merge"), ["__id", "obj_start"])
           .join(docs.hint("merge"), "__id")
           .where((F.expr("substring(__text, subj_end + 2, plen)") == F.col("pred"))
                  & (F.expr("substring(__text, subj_end + 1, 1)") == F.lit(" "))
                  & (F.expr("substring(__text, subj_end + plen + 2, 1)") == F.lit(" ")))
           .select(F.col("__id").alias(id_col),
                   "subj", "pred", "obj",
                   F.col("subj_start").cast("long").alias("subj_start"),
                   F.col("obj_start").cast("long").alias("obj_start")))
    return out
