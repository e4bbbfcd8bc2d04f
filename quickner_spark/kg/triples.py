"""Triple extraction: (subj, pred, obj) from co-occurring mentions.

North-rule stage (BASELINE.json north_star): pattern-based SVO extraction
over annotated sentences. The engine primitive is a *mention-pair pattern
join*: two mentions of the same document linked by a predicate expression
that must match the text between them.

Plan shape: subj mentions join their document text on the doc key (single
sort-merge join, both sides pre-sorted when read from the url-bucketed
stage tables) -> the predicate test runs IN-ROW per subj against all
|preds| literals and the text is dropped in the same projection -> the
surviving slim candidates equi-join mentions on (doc_id, expected object
offset). No mention×predicate fan-out ever reaches a join input (the old
formulation sorted |preds|×|mentions| rows — 459M at 1.6M pages — for the
mention-mention join), and no per-document mention² cross product exists.
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
    m1 = mentions.select(F.col(id_col).alias("__id"),
                         F.col("start").alias("subj_start"),
                         F.col("end").alias("subj_end"),
                         F.col("surface").alias("subj"))
    m2 = mentions.select(F.col(id_col).alias("__id"),
                         F.col("start").alias("obj_start"),
                         F.col("surface").alias("obj"))
    text = F.lower(F.col(text_col)) if lower_text else F.col(text_col)
    docs = documents.select(F.col(id_col).alias("__id"), text.alias("__text"))
    # Plan shape (in join-cost order):
    #
    # 1. subj mentions join their document's text on the doc key alone —
    #    a single-key sort-merge join both of whose sides read PRE-SORTED
    #    from the url-bucketed stage tables (zero exchange, zero sort).
    # 2. The predicate test runs IN-ROW against that text, BEFORE any
    #    mention-mention join: each subj row checks all |preds| literals
    #    (space, predicate token, space after subj.end) and keeps only
    #    textual hits. The doc text is dropped in the same projection, so
    #    the surviving candidate rows are slim (id, offsets, subj, pred).
    #    The earlier formulation fanned every mention out |preds| ways
    #    FIRST (459M rows at 1.6M pages) and sorted that for the
    #    mention-mention join — the whole fan-out now never exists as
    #    join input; only text-confirmed candidates do.
    # 3. The (doc, exact expected object offset) equi-join against the
    #    mention table picks out object mentions. Its right side reads
    #    (url, start)-sorted from the bucketed table, which satisfies the
    #    (url, obj_start) join ordering through the alias — only the
    #    (much smaller) candidate side sorts.
    #
    # Both corpus-sized joins are pinned to sort-merge: compressed-parquet
    # stats under-estimate them and Spark would otherwise broadcast the
    # full mention/document table (serial driver collect+hash — measured
    # as the stage's dominant, non-scaling cost; OOM at corpus scale).
    preds_lit = F.array(*[
        F.struct(F.lit(p).alias("pred"), F.lit(len(p)).alias("plen"))
        for p in predicates])

    def textual_hit(c):
        # text[subj_end] == ' ', then the predicate token, then ' '
        # (1-based substr, identical tests to the reference formulation)
        return ((F.col("__text").substr(F.col("subj_end") + 1, F.lit(1))
                 == F.lit(" "))
                & (F.col("__text").substr(F.col("subj_end") + 2, c["plen"])
                   == c["pred"])
                & (F.col("__text").substr(
                    F.col("subj_end") + c["plen"] + 2, F.lit(1))
                   == F.lit(" ")))

    hits = F.filter(
        F.transform(preds_lit,
                    lambda c: F.struct(c["pred"].alias("pred"),
                                       c["plen"].alias("plen"),
                                       textual_hit(c).alias("ok"))),
        lambda s: s["ok"])
    cand = (m1.join(docs.hint("merge"), "__id")
            .select("__id", "subj_start", "subj_end", "subj",
                    F.explode(hits).alias("__p"))
            .withColumn("obj_start",
                        F.col("subj_end") + 2 + F.col("__p.plen"))
            .select("__id", "subj_start", "subj",
                    F.col("__p.pred").alias("pred"), "obj_start"))
    out = (cand.join(m2.hint("merge"), ["__id", "obj_start"])
           .select(F.col("__id").alias(id_col),
                   "subj", "pred", "obj",
                   F.col("subj_start").cast("long").alias("subj_start"),
                   F.col("obj_start").cast("long").alias("obj_start")))
    return out
