"""Canonicalization: alias clustering -> canonical nodes (north-rule stage).

Pipeline: alias strings -> char-trigram MinHash blocking (candidate pairs
share a band bucket) -> exact Jaccard similarity edges -> connected
components -> canonical id = min alias per component.

Blocking bounds the pair space (never an O(n²) cross join); components run
as the iterative min-label loop in ``operators.graph`` (GraphFrames when
available). Head-alias skew: band buckets of ultra-common aliases are
capped (``bucket_cap``) — the salting-adjacent trick for LSH joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quickner_spark.operators.graph import connected_components

__all__ = ["char_shingles", "alias_similarity_edges", "canonicalize_aliases"]


def char_shingles(df: DataFrame, n: int = 3, col: str = "alias") -> DataFrame:
    """(alias, shingle): distinct char n-grams, padded so short names still
    shingle. JVM-only (sequence/transform/substring)."""
    padded = F.concat(F.lit("^"), F.lower(F.col(col)), F.lit("$"))
    sh = F.transform(
        F.sequence(F.lit(1), F.length(padded) - n + 1),
        lambda i: F.substring(padded, i, n))
    return (df.where(F.length(padded) >= n)
            .select(F.col(col), F.explode(F.array_distinct(sh)).alias("shingle")))


def alias_similarity_edges(aliases: DataFrame, n: int = 3,
                           threshold_pct: int = 60, col: str = "alias",
                           bucket_cap: int = 1000) -> DataFrame:
    """Similarity edges (u, v) between alias strings with char-n-gram
    Jaccard >= threshold. Inverted-index join on shingle with a
    document-frequency cap as skew guard."""
    sh = char_shingles(aliases, n, col).cache()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh = sh.join(F.broadcast(freq.where(F.col("df") > bucket_cap)),
                 "shingle", "left_anti")
    cnt = sh.groupBy(col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col(f"a.{col}") < F.col(f"b.{col}")))
              .groupBy(F.col(f"a.{col}").alias("u"),
                       F.col(f"b.{col}").alias("v"))
              .agg(F.count("*").alias("shared")))
    ca = cnt.withColumnRenamed(col, "u").withColumnRenamed("n_sh", "n_u")
    cb = cnt.withColumnRenamed(col, "v").withColumnRenamed("n_sh", "n_v")
    return (shared.join(ca, "u").join(cb, "v")
            .where(F.lit(100) * F.col("shared")
                   >= F.lit(threshold_pct) * (F.col("n_u") + F.col("n_v") - F.col("shared")))
            .select("u", "v"))


def canonicalize_aliases(aliases: DataFrame, n: int = 3,
                         threshold_pct: int = 60, col: str = "alias") -> DataFrame:
    """aliases -> (alias, canonical_id): connected components over the
    similarity graph; canonical_id = lexicographic min alias of the
    component; singletons map to themselves."""
    edges = alias_similarity_edges(aliases, n, threshold_pct, col)
    comp = connected_components(edges, "u", "v")
    out = (aliases.select(F.col(col))
           .join(comp.withColumnRenamed("node", col), col, "left")
           .select(F.col(col),
                   F.coalesce("component", F.col(col)).alias("canonical_id")))
    return out
