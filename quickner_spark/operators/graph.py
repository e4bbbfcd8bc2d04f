"""Graph primitives: connected components as an iterative DataFrame loop.

GraphFrames is not assumed (gated import); the fallback is min-label
propagation over the edge list:

    comp(v) <- min(comp(v), min over neighbors u of comp(u))

which converges in O(graph diameter) rounds. Alias/canonicalization graphs
are shallow (stars around a canonical name), so few rounds suffice. Each
round is one shuffle (join on src + groupBy dst); ``localCheckpoint``
truncates lineage so plans don't grow across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Undirected connected components. Returns (node, component) where
    component = min node id (orderable type) in the component.

    Deterministic: min-propagation has a unique fixpoint. Convergence is
    checked with a count of changed labels per round (one action per
    round; at scale, check every few rounds instead to save jobs).
    """
    try:
        from graphframes import GraphFrame  # type: ignore
        vertices = (edges.select(F.col(src).alias("id"))
                    .union(edges.select(F.col(dst).alias("id"))).distinct())
        g = GraphFrame(vertices, edges.selectExpr(f"{src} as src", f"{dst} as dst"))
        cc = g.connectedComponents()
        return cc.selectExpr("id as node", "component")
    except ImportError:
        pass

    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    sym = sym.distinct().localCheckpoint()
    comp = (sym.select(F.col("u").alias("node")).distinct()
            .withColumn("component", F.col("node")))
    for _ in range(max_iter):
        # candidate label for each node = min over neighbors' components
        nbr_min = (sym.join(comp, sym.v == comp.node)
                   .groupBy("u").agg(F.min("component").alias("nbr_comp"))
                   .withColumnRenamed("u", "node"))
        new_comp = (comp.join(nbr_min, "node", "left")
                    .select("node",
                            F.least(F.col("component"),
                                    F.coalesce(F.col("nbr_comp"), F.col("component"))
                                    ).alias("component")))
        new_comp = new_comp.localCheckpoint()
        changed = (new_comp.alias("n").join(comp.alias("o"), "node")
                   .where(F.col("n.component") != F.col("o.component")).count())
        comp = new_comp
        if changed == 0:
            break
    return comp
