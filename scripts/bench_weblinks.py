"""Hyperlink host-graph scaling: extract_links -> host_graph
(kg/weblinks.py) over messy real-web-shaped pages with planted cross-host
anchors, at two pinned parallelism levels on the same parquet input — the
operator-level N vs 4N evidence for the webgraph path (the pipeline-level
twin is ``bench_pipeline_scaling.py``).

The job is pure JVM column work (regexp scan + explode + map-side-combined
pair count) — no Python workers at all — so this row also isolates how the
engine's codegen path scales when the memory bus, not Python, is the
ceiling.

Usage: python scripts/bench_weblinks.py
Env: WEBLINKS_DOCS (default 400000), WEBLINKS_LO/HI (default 4/16),
     WEBLINKS_PASSES (default 4), WEBLINKS_HOSTS (default 64),
     WEBLINKS_INTERLEAVES (default 2), WEBLINKS_CORPUS (parquet cache dir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LO = int(os.environ.get("WEBLINKS_LO", "4"))
HI = int(os.environ.get("WEBLINKS_HI", "16"))
N_DOCS = int(os.environ.get("WEBLINKS_DOCS", "400000"))
PASSES = int(os.environ.get("WEBLINKS_PASSES", "4"))
HOSTS = int(os.environ.get("WEBLINKS_HOSTS", "64"))
CORPUS = os.environ.get("WEBLINKS_CORPUS", "/tmp/quickner_weblinks_corpus")

_GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from quickner_spark.session import get_spark
from quickner_spark.kg import corpus

n_docs, hosts, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark("weblinks-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
corpus.synth_pages(spark, n_docs, partitions=128, html_style="messy",
                   outlink_hosts=hosts).select("url", "html") \
    .write.mode("overwrite").parquet(path)
print("generated")
spark.stop()
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from quickner_spark.session import get_spark
from quickner_spark.kg.weblinks import extract_links, host_graph

cores, passes, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# heap proportional to cores, as N vs 4N executor fleets would have
os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(cores, 4)}g")
spark = get_spark(f"weblinks-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path).repartition(cores * 4).cache()
n_docs = pages.count()  # materialize cache outside the timed region
host_graph(extract_links(pages)).count()  # warm-up: codegen + JIT
times, n_edges = [], 0
for _ in range(passes):
    t0 = time.time()
    n_edges = host_graph(extract_links(pages)).count()
    times.append(time.time() - t0)
best = min(times)
print(json.dumps({"cores": cores, "pass_sec": [round(t, 2) for t in times],
                  "pages_per_sec": round(n_docs / best, 1),
                  "host_edges": n_edges}))
spark.stop()
"""


def _run(code: str, *args: str, cpus: int | None = None) -> str:
    # pin the process tree to exactly `cpus` cores (see bench_scaling.py:
    # an N-executor cluster only has N cores; taskset models that honestly)
    cmd = [sys.executable, "-c", code, *args]
    if cpus is not None:
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
        _run(_GEN, str(N_DOCS), str(HOSTS), CORPUS)
    runs: dict[int, list[dict]] = {LO: [], HI: []}
    for cores in (LO, HI) * int(os.environ.get("WEBLINKS_INTERLEAVES", "2")):
        runs[cores].append(json.loads(
            _run(_WORKER, str(cores), str(PASSES), CORPUS, cpus=cores)))
    lo = max(runs[LO], key=lambda r: r["pages_per_sec"])
    hi = max(runs[HI], key=lambda r: r["pages_per_sec"])
    assert lo["host_edges"] == hi["host_edges"], (lo, hi)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (HI / LO)
    result = {
        "job": "hyperlink host graph (extract_links -> host_graph, pure JVM)",
        "n_docs": N_DOCS, "outlink_hosts": HOSTS, "passes": PASSES,
        f"local{LO}": lo, f"local{HI}": hi,
        "speedup": round(hi["pages_per_sec"] / lo["pages_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        fh.write(
            f"| HOST GRAPH (weblinks regexp scan + pair count), "
            f"{N_DOCS} messy pages, {HOSTS}-host universe "
            f"| {lo['pages_per_sec']} pages/s @{LO} "
            f"| {hi['pages_per_sec']} pages/s @{HI} "
            f"| speedup {result['speedup']}x "
            f"| efficiency {result['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
