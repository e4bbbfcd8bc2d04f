"""Entity co-occurrence statistics over the mentions table.

Co-occurrence is the KG's second edge signal next to pattern triples:
two entities repeatedly mentioned in the same document are related even
when no predicate window fires, and the (pair, marginal) counts feed
association scores (PMI/NPMI) for edge weighting and link prediction.

Scale shape: the only corpus-sized shuffle keys on the document id (the
mentions table's natural key); pair expansion is per-document O(k²) in
the number of DISTINCT entities per doc — bounded by the gazetteer hit
density, and capped hard with ``max_per_doc`` (listing/link-farm pages
that mention hundreds of entities contribute quadratic pairs and mostly
noise; dropping them is standard co-occurrence practice). All counting
aggregates are map-side combined; output is bounded by the distinct
co-occurring pair set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quickner_spark.operators.caching import track

__all__ = ["cooccurrence", "with_npmi"]


def cooccurrence(mentions: DataFrame, doc_col: str = "doc_id",
                 key_col: str = "surface", min_docs: int = 1,
                 max_per_doc: int | None = None) -> DataFrame:
    """(e1, e2, n_docs, n_e1, n_e2, n_corpus) — for every unordered
    entity pair (e1 < e2), the number of documents mentioning both,
    each side's document frequency, and the corpus document count
    (integer columns only, so the q53 oracle is value-exact).

    ``max_per_doc`` drops documents whose distinct-entity count exceeds
    the cap BEFORE pair expansion (the quadratic guard; None = no cap —
    corpus-scale callers should set one). ``min_docs`` prunes rare
    pairs after aggregation.

    The deduped (doc, entity) projection is referenced four times
    (corpus count, marginals, both self-join sides), so it is cached
    under the scoped-cache contract — call ``caching.release(result)``
    after the final action, or the distinct shuffle runs four times."""
    de = (mentions.select(F.col(doc_col).alias("doc"),
                          F.col(key_col).alias("e"))
          .distinct())
    if max_per_doc is not None:
        per_doc = de.groupBy("doc").agg(F.count("*").alias("__k"))
        de = (de.join(per_doc.where(F.col("__k") <= max_per_doc)
                      .select("doc"), "doc"))
    de = de.cache()
    n_corpus = de.select("doc").distinct().agg(
        F.count("*").alias("n_corpus"))
    marg = de.groupBy("e").agg(F.count("*").alias("n"))
    left = de.select("doc", F.col("e").alias("e1"))
    right = de.select("doc", F.col("e").alias("e2"))
    pairs = (left.join(right, "doc")
             .where(F.col("e1") < F.col("e2"))
             .groupBy("e1", "e2").agg(F.count("*").alias("n_docs")))
    if min_docs > 1:
        pairs = pairs.where(F.col("n_docs") >= min_docs)
    m1 = marg.select(F.col("e").alias("e1"), F.col("n").alias("n_e1"))
    m2 = marg.select(F.col("e").alias("e2"), F.col("n").alias("n_e2"))
    out = (pairs.join(m1, "e1").join(m2, "e2")
           .join(F.broadcast(n_corpus))
           .select("e1", "e2", "n_docs", "n_e1", "n_e2", "n_corpus"))
    return track(out, de)


def with_npmi(cooc: DataFrame) -> DataFrame:
    """Append ``pmi`` and ``npmi`` (double) to a :func:`cooccurrence`
    result: pmi = log(p(1,2) / (p(1)·p(2))), npmi = pmi / -log(p(1,2)),
    npmi in [-1, 1] with 1 = perfect co-occurrence. Floating point —
    production scoring, deliberately outside the integer oracle."""
    p12 = F.col("n_docs") / F.col("n_corpus")
    p1 = F.col("n_e1") / F.col("n_corpus")
    p2 = F.col("n_e2") / F.col("n_corpus")
    pmi = F.log(p12 / (p1 * p2))
    return cooc.select(
        "*", pmi.alias("pmi"),
        F.when(p12 == 1.0, F.lit(1.0))  # -log(1) = 0 denominator
         .otherwise(pmi / -F.log(p12)).alias("npmi"))
