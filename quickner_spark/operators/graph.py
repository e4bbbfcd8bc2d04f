"""Graph primitives: connected components as an iterative DataFrame loop.

GraphFrames is not assumed (gated import); the fallback is min-label
propagation over the edge list:

    comp(v) <- min(comp(v), min over neighbors u of comp(u))

which converges in O(graph diameter) rounds. Alias/canonicalization graphs
are shallow (stars around a canonical name), so few rounds suffice. Each
round is one shuffle (join on src + groupBy dst); ``localCheckpoint``
truncates lineage so plans don't grow across iterations.

Small graphs take a driver fast path (same rationale as a broadcast join:
don't launch N distributed rounds against broadcast-sized data). The edge
list is persisted (MEMORY_AND_DISK — recoverable, unlike localCheckpoint)
and counted once; below ``driver_threshold`` edges it is collected and
solved with union-find — identical min-label output, one job instead of
3-4 per round. At KG scale the alias graph is |distinct aliases| ≈ 10^7,
far above the threshold, and the distributed loop runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType

__all__ = ["connected_components"]


def _driver_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Union-find on a collected edge list; component = min node id —
    the same fixpoint the distributed loop converges to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    pairs = edges.select(src, dst).collect()
    for r in pairs:
        for n in (r[0], r[1]):
            if n not in parent:
                parent[n] = n
        ru, rv = find(r[0]), find(r[1])
        if ru != rv:
            # union by label order so every root is its component's min
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    node_type = edges.schema[src].dataType
    schema = StructType([StructField("node", node_type, False),
                         StructField("component", node_type, False)])
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, schema)


def _min_id_components(cc: DataFrame) -> DataFrame:
    """Normalize a GraphFrames ``connectedComponents()`` result (id,
    component) to this module's contract: component = MIN member node id,
    in the node's own type. GraphFrames emits generated LONG component ids
    (and for string vertex ids a type that doesn't even compare with the
    node id), which would silently break consumers like
    textops.dup_clusters whose keep-decision is ``cluster_id == doc_id``.
    One aggregate plus a join keyed on the (small) component id set."""
    rep = cc.groupBy("component").agg(F.min("id").alias("rep"))
    return (cc.join(rep, "component")
            .select(F.col("id").alias("node"),
                    F.col("rep").alias("component")))


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25,
                         driver_threshold: int = 100_000,
                         check_every: int = 3) -> DataFrame:
    """Undirected connected components. Returns (node, component) where
    component = min node id (orderable type) in the component.

    Deterministic: min-propagation has a unique fixpoint. Convergence is
    tested with a changed-label count only every ``check_every`` rounds
    (plus the final round) — each check is a join + count ACTION, so
    checking every round pays 2 extra jobs per round for information that
    rarely changes the outcome; propagation past the fixpoint is a no-op,
    so sparse checking returns the identical labeling (pinned by a
    differential test). ``check_every=1`` restores per-round checking.
    ``driver_threshold``: edge count at or below which the union-find fast
    path runs (0 disables it, used by differential tests).
    """
    persisted = None
    if driver_threshold:
        # persist (recoverable, spillable) rather than localCheckpoint:
        # localCheckpoint materializes the whole edge list to executor
        # storage eagerly AND is not fault-tolerant — an executor loss
        # during the distributed loop would be unrecoverable instead of a
        # recompute. persist+count gives the same count-once/reuse without
        # either cost.
        from pyspark.storagelevel import StorageLevel

        persisted = edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        if edges.count() <= driver_threshold:
            out = _driver_components(edges, src, dst)
            persisted.unpersist()
            return out
    try:
        from graphframes import GraphFrame  # type: ignore
        vertices = (edges.select(F.col(src).alias("id"))
                    .union(edges.select(F.col(dst).alias("id"))).distinct())
        g = GraphFrame(vertices, edges.selectExpr(f"{src} as src", f"{dst} as dst"))
        cc = g.connectedComponents()  # runs eagerly (internal checkpoints)
        if persisted is not None:
            persisted.unpersist()
        return _min_id_components(cc)
    except ImportError:
        pass

    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    # localCheckpoint here is purely per-loop lineage truncation (sym is
    # re-joined every round); once it is materialized the cached edge list
    # is no longer needed
    sym = sym.distinct().localCheckpoint()
    if persisted is not None:
        persisted.unpersist()
    comp = (sym.select(F.col("u").alias("node")).distinct()
            .withColumn("component", F.col("node")))
    for i in range(max_iter):
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
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            changed = (new_comp.alias("n").join(comp.alias("o"), "node")
                       .where(F.col("n.component") != F.col("o.component"))
                       .count())
            if changed == 0:
                comp = new_comp
                break
        comp = new_comp
    return comp
