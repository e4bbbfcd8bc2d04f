"""Graph-operator scaling: triangle_count and cocitation
(operators/graph.py) over a deterministic power-law host graph, at two
pinned parallelism levels on the same parquet input — the operator-level
N vs 4N evidence for the round-4 webgraph cohesion queries.

The synthetic graph is the shape that breaks naive implementations:
hash-generated Zipf-ish endpoint popularity gives a heavy-tailed degree
distribution (a few celebrity hosts with thousands of neighbors), which a
wedge join without degree orientation turns into sum(deg^2) blowup. The
bench therefore measures exactly the property the operator's design
claims: work bounded by the orientation, not by the hottest node.

Usage: python scripts/bench_graphops.py
Env: GRAPHOPS_EDGES (default 3000000), GRAPHOPS_NODES (default 120000),
     GRAPHOPS_LO/HI (default 4/16), GRAPHOPS_PASSES (default 3),
     GRAPHOPS_INTERLEAVES (default 2), GRAPHOPS_CORPUS (parquet cache),
     GRAPHOPS_JOBS (comma list of triangles,cocitation,lpa,wpagerank —
     default "triangles,cocitation").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LO = int(os.environ.get("GRAPHOPS_LO", "4"))
HI = int(os.environ.get("GRAPHOPS_HI", "16"))
N_EDGES = int(os.environ.get("GRAPHOPS_EDGES", "3000000"))
N_NODES = int(os.environ.get("GRAPHOPS_NODES", "120000"))
PASSES = int(os.environ.get("GRAPHOPS_PASSES", "3"))
CORPUS = os.environ.get("GRAPHOPS_CORPUS", "/tmp/quickner_graphops_corpus")

# Zipf-ish endpoint draw: node = floor(N * u^alpha) with u uniform from a
# hash — alpha=3 gives a heavy head (node 0 lands ~1.4% of endpoints at
# 120k nodes) without any Python in the generator. Deterministic: both
# endpoints derive from xxhash64 of the edge index with distinct salts.
_GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from quickner_spark.session import get_spark

n_edges, n_nodes, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark("graphops-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")

def zipfish(col, salt):
    u = (F.abs(F.xxhash64(col, F.lit(salt))) % F.lit(1_000_003)) \
        / F.lit(1_000_003.0)
    return F.floor(F.lit(n_nodes) * F.pow(u, F.lit(3.0))).cast("long")

edges = (spark.range(n_edges, numPartitions=128)
         .select(F.concat(F.lit("h"), zipfish(F.col("id"), 1)).alias("src"),
                 F.concat(F.lit("h"), zipfish(F.col("id"), 2)).alias("dst"))
         .where(F.col("src") != F.col("dst")))
edges.write.mode("overwrite").parquet(path)
print("generated")
spark.stop()
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from quickner_spark.session import get_spark
from pyspark.sql import functions as F
from quickner_spark.operators.caching import release
from quickner_spark.operators.graph import (cocitation, label_propagation,
                                            pagerank, triangle_count)

cores, passes, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jobs_sel = sys.argv[4].split(",")
os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(cores, 4)}g")
spark = get_spark(f"graphops-{cores}", cores=cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet(path).repartition(cores * 4).cache()
n_edges = edges.count()  # materialize cache outside the timed region

def run_released(df, action):
    # release the operator's tracked caches after every pass: CacheManager
    # keys by logical plan, so without this pass 2 would silently reuse
    # pass 1's materialized cache and the bench would measure rescans
    try:
        return action(df)
    finally:
        release(df)

# deterministic per-edge weight for the weighted-pagerank job (the
# corpus has no weight column; anchor-count-shaped 1..10)
wedges = edges.withColumn(
    "w", (F.abs(F.xxhash64("src", "dst")) % 10 + 1).cast("long"))

ALL_JOBS = {
    "triangles": lambda: run_released(
        triangle_count(edges),
        lambda d: d.agg({"triangles": "sum"}).collect()[0][0]),
    "cocitation": lambda: run_released(
        cocitation(edges, min_shared=2, max_fanout=4096),
        lambda d: d.count()),
    # iterative loops: fixed rounds, lineage cut per round — measures
    # the per-iteration join+agg shape, results reduced to a checksum
    "lpa": lambda: label_propagation(edges, iters=2)
        .agg(F.expr("bit_xor(xxhash64(node, community))")).collect()[0][0],
    "wpagerank": lambda: pagerank(wedges, iters=3, weight="w",
                                  arithmetic="integer")
        .agg(F.sum("rank")).collect()[0][0],
}
out = {"cores": cores, "n_edges": n_edges}
for name in jobs_sel:
    job = ALL_JOBS[name]
    job()  # warm-up: codegen + JIT
    times, val = [], None
    for _ in range(passes):
        t0 = time.time()
        val = job()
        times.append(time.time() - t0)
    best = min(times)
    out[name] = {"pass_sec": [round(t, 2) for t in times],
                 "edges_per_sec": round(n_edges / best, 1),
                 "result": int(val)}
print(json.dumps(out))
spark.stop()
"""


def _run(code: str, *args: str, cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code, *args]
    if cpus is not None:
        # an N-executor cluster only has N cores; taskset models that
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    pp = "/root/repo" + (os.pathsep + os.environ["PYTHONPATH"]
                         if os.environ.get("PYTHONPATH") else "")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=2400,
                         env={**os.environ, "PYTHONPATH": pp})
    if out.returncode != 0:
        raise RuntimeError(
            f"worker exited {out.returncode}: {out.stderr[-2000:]}")
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return lines[-1]


def main() -> None:
    if not os.path.exists(CORPUS + "/_SUCCESS"):
        _run(_GEN, str(N_EDGES), str(N_NODES), CORPUS)
    jobs = os.environ.get("GRAPHOPS_JOBS", "triangles,cocitation")
    runs: dict[int, list[dict]] = {LO: [], HI: []}
    for cores in (LO, HI) * int(os.environ.get("GRAPHOPS_INTERLEAVES", "2")):
        runs[cores].append(json.loads(
            _run(_WORKER, str(cores), str(PASSES), CORPUS, jobs,
                 cpus=cores)))
    rows = []
    for name in jobs.split(","):
        lo = max(runs[LO], key=lambda r: r[name]["edges_per_sec"])[name]
        hi = max(runs[HI], key=lambda r: r[name]["edges_per_sec"])[name]
        assert lo["result"] == hi["result"], (name, lo, hi)
        eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (HI / LO)
        rows.append({
            "job": name, "n_edges": N_EDGES, "n_nodes": N_NODES,
            f"local{LO}": lo, f"local{HI}": hi,
            "speedup": round(hi["edges_per_sec"] / lo["edges_per_sec"], 2),
            "scaling_efficiency": round(eff, 3)})
    print(json.dumps(rows))
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        for r in rows:
            fh.write(
                f"| GRAPH OP {r['job']} (degree-oriented, Zipf-head graph),"
                f" {N_EDGES} edges / {N_NODES} nodes "
                f"| {r[f'local{LO}']['edges_per_sec']} edges/s @{LO} "
                f"| {r[f'local{HI}']['edges_per_sec']} edges/s @{HI} "
                f"| speedup {r['speedup']}x "
                f"| efficiency {r['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
