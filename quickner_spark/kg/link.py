"""Entity-link candidate scoring (north-rule stage).

Each mention surface may map to several candidate canonical entities (alias
table). Score = prior popularity + context token overlap, argmax per
mention:

    score(mention, cand) = log(1 + prior(cand)) + |tokens(doc) ∩ profile(cand)|

Everything is JVM-side: the alias->candidate table is small and broadcast;
context overlap is ``array_intersect`` on token arrays; argmax is
``max_by`` (one hash aggregate, no window shuffle-sort).

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
    doc_tokens = documents.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__toks"))
    # project the mention's own label away: the output label is the linked
    # candidate's (alias table), and both sides naming it is ambiguous.
    m = mentions.select(id_col, "start", "end", "surface")
    cands = (m.join(F.broadcast(alias_table),
                    F.lower(m["surface"]) == alias_table["alias"])
             .join(doc_tokens, id_col))
    profile = F.split(F.replace(F.col("canonical_id"), F.lit("_"), F.lit(" ")), " ")
    score = (F.log1p(F.col("prior"))
             + F.size(F.array_intersect(F.col("__toks"), profile)))
    scored = cands.withColumn("__score", score)
    best = (scored.groupBy(id_col, "start", "end", "surface")
            .agg(F.max_by(
                F.struct(F.col("canonical_id"), F.col("label"),
                         F.col("__score").alias("score")),
                F.struct(F.col("__score"), F.col("canonical_id"))).alias("b"))
            .select(id_col, "start", "end", "surface",
                    "b.canonical_id", "b.label", "b.score"))
    return best
