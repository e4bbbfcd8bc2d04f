"""Entity-link candidate scoring (north-rule stage).

Each mention surface may map to several candidate canonical entities (alias
table). Score = prior popularity + context token overlap, argmax per
mention:

    score(mention, cand) = log(1 + prior(cand)) + |tokens(doc) ∩ profile(cand)|

Everything is JVM-side: the alias->candidate table is small and broadcast;
context overlap is computed against the broadcast profile VOCABULARY (each
doc reduced to its distinct profile-token hits — never a shuffled token
array); argmax is ``max_by`` (one hash aggregate, no window shuffle-sort).

Skew note: head surfaces ("acme systems") produce huge mention groups, but
the aggregate is keyed per (doc, mention occurrence), not per surface, so
no single key grows with corpus size — the broadcast join keeps the plan
shuffle-free up to the argmax agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["alias_table_from_gazetteer", "link_mentions"]


def alias_table_from_gazetteer(spark, gazetteer, extra_aliases=None) -> DataFrame:
    """Candidate table (alias, canonical_id, label, prior). Canonical id =
    the gazetteer name with ``_`` for spaces; prior = alias frequency rank
    stand-in (deterministic: length-invariant hash bucket)."""
    rows = []
    for name, label in gazetteer:
        canonical = name.replace(" ", "_")
        rows.append((name.lower(), canonical, label, 100))
        if extra_aliases:
            for al in extra_aliases.get(name, []):
                rows.append((al.lower(), canonical, label, 10))
    return spark.createDataFrame(
        rows, "alias string, canonical_id string, label string, prior int")


def link_mentions(mentions: DataFrame, documents: DataFrame,
                  alias_table: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """mentions + documents + aliases -> linked mentions
    (doc_id, start, end, surface, canonical_id, label, score).

    Candidates joined by lowercased surface (broadcast); context overlap =
    |doc tokens ∩ canonical-name tokens|; winner = max_by(score, candidate).
    """
    # Scale shape (identical output to the naive per-mention plan):
    # 1. score(mention, cand) depends only on (doc, surface) — never on
    #    span position — so the argmax runs over DISTINCT (doc, alias)
    #    pairs (<= docs x surfaces-per-doc, tiny vs mention count) and the
    #    winners join back to mentions. No wide-key aggregate over the
    #    full mention table.
    # 2. Context overlap never shuffles token arrays: docs reduce to their
    #    distinct profile-vocabulary hits (broadcast semi-join filter),
    #    and overlap is counted only for (doc, candidate) pairs actually
    #    triggered by a mention in that doc — computing it for every
    #    canonical sharing a token explodes on head tokens ("inc", "co").
    # project the mention's own label away: the output label is the linked
    # candidate's (alias table), and both sides naming it is ambiguous.
    m = mentions.select(id_col, "start", "end", "surface",
                        F.lower("surface").alias("__alias"))
    da = m.select(id_col, "__alias").distinct()
    cands = da.join(F.broadcast(alias_table),
                    da["__alias"] == alias_table["alias"])
    prof = (alias_table.select("canonical_id").distinct()
            .select("canonical_id",
                    F.explode(F.split(F.replace(F.col("canonical_id"),
                                                F.lit("_"), F.lit(" ")),
                                      " ")).alias("__tok"))
            .distinct())
    vocab = prof.select("__tok").distinct()
    doc_hits = (documents.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__tok"))
        .join(F.broadcast(vocab), "__tok", "left_semi")  # narrow pre-filter
        .distinct())
    pairs = (cands.select(id_col, "canonical_id").distinct()
             .join(F.broadcast(prof), "canonical_id"))
    overlap = (pairs.join(doc_hits, [id_col, "__tok"])
               .groupBy(id_col, "canonical_id")
               .agg(F.count("*").alias("__ov")))
    scored = (cands.join(overlap, [id_col, "canonical_id"], "left")
              .withColumn("__score", F.log1p(F.col("prior"))
                          + F.coalesce(F.col("__ov"), F.lit(0))))
    best = (scored.groupBy(id_col, "__alias")
            .agg(F.max_by(
                F.struct(F.col("canonical_id"), F.col("label"),
                         F.col("__score").alias("score")),
                F.struct(F.col("__score"), F.col("canonical_id"))).alias("b"))
            .select(id_col, "__alias",
                    "b.canonical_id", "b.label", "b.score"))
    return (m.join(best, [id_col, "__alias"])
            .select(id_col, "start", "end", "surface",
                    "canonical_id", "label", "score"))
