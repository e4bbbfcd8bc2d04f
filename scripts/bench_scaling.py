"""Scaling-efficiency benchmark: the same job at two parallelism levels
(local[8] vs local[32]) on the same input — the sandbox stand-in for the
north rule's N vs 4N executor-cluster criterion.

The measured job is the annotate stage (broadcast gazetteer + mapInPandas)
over a deterministic synthetic corpus sized so per-task work dominates JVM
fixed costs. Each level runs in its own subprocess (one JVM can't host two
masters). Prints one JSON line and appends a table to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOCS = int(os.environ.get("SCALING_DOCS", "60000"))
GAZ = int(os.environ.get("SCALING_GAZ", "999"))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from quickner_spark.session import get_spark
from quickner_spark.kg import corpus
from quickner_spark.operators.annotate import annotate_mentions, normalize_gazetteer

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); gaz_n = int(sys.argv[3])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = corpus.synth_pages(spark, n_docs, partitions=cores * 4)
pages = pages.select("url", "text").cache()
pages.count()  # materialize input outside the timed region
gaz = normalize_gazetteer(corpus.synth_gazetteer(gaz_n))
# warm-up: compile plan + fork python workers once
annotate_mentions(pages.limit(1000), gaz, id_col="url").count()
t0 = time.time()
n_mentions = annotate_mentions(pages, gaz, id_col="url").count()
dt = time.time() - t0
print(json.dumps({"cores": cores, "sec": round(dt, 2),
                  "docs_per_sec": round(n_docs / dt, 1),
                  "mentions": n_mentions}))
spark.stop()
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cores), str(N_DOCS), str(GAZ)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": "/root/repo"})
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
    result = {
        "job": "annotate (broadcast gazetteer + mapInPandas)",
        "n_docs": N_DOCS, "gazetteer": GAZ,
        "local8": lo, "local32": hi,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        fh.write(
            f"\n| {N_DOCS} docs, {GAZ}-name gazetteer "
            f"| {lo['docs_per_sec']} docs/s @8 | {hi['docs_per_sec']} docs/s @32 "
            f"| speedup {result['speedup']}x | efficiency {result['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
