"""Crawl-loop scaling: kg/crawl.py::crawl at two pinned parallelism
levels over the same synthetic web — the pipeline-level N vs 4N
evidence for the crawl operating mode (frontier planning + fetch join
+ discovery + canonical-dedup anti-join, 4 BFS rounds).

The web is a B-ary forest over H hosts: page i links to children
i·B+1 … i·B+B (cross-host by construction — child host = child % H)
plus one robots-disallowed /private/ link per page, so every round
exercises robots filtering, politeness windows, the fetch join, link
discovery, and the growing seen-table anti-join. Seeds are the first S
roots; with B=4 and 4 rounds the crawl fetches S·(1+4+16+64) pages.

Usage: python scripts/bench_crawl.py
Env: CRAWL_SEEDS (default 3000), CRAWL_BRANCH (default 4),
     CRAWL_ROUNDS (default 4), CRAWL_HOSTS (default 1000),
     CRAWL_LO/HI (default 4/16), CRAWL_INTERLEAVES (default 2),
     CRAWL_DIR (parquet cache dir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LO = int(os.environ.get("CRAWL_LO", "4"))
HI = int(os.environ.get("CRAWL_HI", "16"))
SEEDS = int(os.environ.get("CRAWL_SEEDS", "20000"))
BRANCH = int(os.environ.get("CRAWL_BRANCH", "4"))
ROUNDS = int(os.environ.get("CRAWL_ROUNDS", "4"))
HOSTS = int(os.environ.get("CRAWL_HOSTS", "1000"))
BASE = os.environ.get("CRAWL_DIR", "/tmp/quickner_crawlbench")

_GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from quickner_spark.session import get_spark

seeds, branch, rounds, hosts, base = (int(sys.argv[1]), int(sys.argv[2]),
                                      int(sys.argv[3]), int(sys.argv[4]),
                                      sys.argv[5])
# universe: every page FETCHABLE within `rounds` levels (ids tile
# contiguously, so the max fetched id is ~seeds * branch^(rounds-1));
# discoveries of the final round are never fetched and need no rows
total = seeds * branch ** (rounds - 1) + branch ** rounds + seeds
spark = get_spark("crawl-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")

i = F.col("id")
host = F.concat(F.lit("h"), (i % hosts).cast("string"),
                F.lit(".example.com"))
url = F.concat(F.lit("https://"), host, F.lit("/p/"), i.cast("string"))


def child_url(j):
    c = i * branch + j
    return F.concat(F.lit('<a href="https://h'),
                    (c % hosts).cast("string"),
                    F.lit(".example.com/p/"), c.cast("string"),
                    F.lit('">x</a>'))


anchors = F.concat(*[child_url(j) for j in range(1, branch + 1)])
html = F.concat(F.lit("<html><body>Page body text. "), anchors,
                F.lit('<a href="/private/'), i.cast("string"),
                F.lit('">no</a></body></html>'))
(spark.range(total, numPartitions=128)
 .select(url.alias("url"), html.cast("binary").alias("html"))
 .write.mode("overwrite").parquet(base + "/web"))

h = spark.range(hosts).select(
    F.concat(F.lit("h"), F.col("id").cast("string"),
             F.lit(".example.com")).alias("host"),
    F.lit("User-agent: *\nDisallow: /private/\nCrawl-delay: 1")
     .alias("body"))
h.write.mode("overwrite").parquet(base + "/robots")
print("generated", total)
spark.stop()
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from quickner_spark.session import get_spark
from quickner_spark.kg.crawl import crawl
from quickner_spark.kg.robots import crawl_delays, robots_rules

cores, seeds, rounds, base = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
# fleet model: N executors x 4g — heap proportional to core count
os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{cores * 4}g")
spark = get_spark(f"crawl-{cores}", cores=cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
# hash-partitioned on the join key: the per-round fetch join then only
# shuffles the frontier side (the crawl-db layout — the store is
# bucketed by url, matching kg/crawl.py's scale guidance)
web = spark.read.parquet(base + "/web") \
    .repartition(cores * 4, "url").cache()
web.count()
robots = spark.read.parquet(base + "/robots")
rules = robots_rules(robots).cache(); rules.count()
delays = crawl_delays(robots).cache(); delays.count()
seed_df = spark.range(seeds).select(
    F.concat(F.lit("https://h"), (F.col("id") % {hosts}).cast("string"),
             F.lit(".example.com/p/"), F.col("id").cast("string"))
    .alias("url"))


def fetch(plan):
    return plan.select("url").join(web, "url").select("url", "html")


t0 = time.time()
res = crawl(seed_df, fetch, rules, delays, rounds=rounds)
n_pages = res.pages.count()
wall = time.time() - t0
sig = res.pages.agg(F.sum(F.xxhash64("url").cast("decimal(38,0)"))
                    ).collect()[0][0]
sig = str(sig)
print(json.dumps({"cores": cores, "wall": round(wall, 1),
                  "pages": n_pages, "sig": sig,
                  "rounds": res.frontier_sizes,
                  "pages_per_sec": round(n_pages / wall, 1)}))
spark.stop()
"""


def _run(code: str, *args: str, cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code, *args]
    if cpus is not None:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    pp = "/root/repo" + (os.pathsep + os.environ["PYTHONPATH"]
                         if os.environ.get("PYTHONPATH") else "")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env={**os.environ, "PYTHONPATH": pp})
    if out.returncode != 0:
        raise RuntimeError(
            f"worker exited {out.returncode}: {out.stderr[-2000:]}")
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return lines[-1]


def main() -> None:
    worker = _WORKER.replace("{hosts}", str(HOSTS))
    if not os.path.exists(BASE + "/robots/_SUCCESS"):
        _run(_GEN, str(SEEDS), str(BRANCH), str(ROUNDS), str(HOSTS), BASE)
    runs: dict[int, list[dict]] = {LO: [], HI: []}
    for cores in (LO, HI) * int(os.environ.get("CRAWL_INTERLEAVES", "2")):
        runs[cores].append(json.loads(
            _run(worker, str(cores), str(SEEDS), str(ROUNDS), BASE,
                 cpus=cores)))
    lo = max(runs[LO], key=lambda r: r["pages_per_sec"])
    hi = max(runs[HI], key=lambda r: r["pages_per_sec"])
    assert lo["pages"] == hi["pages"] and lo["sig"] == hi["sig"], (lo, hi)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (HI / LO)
    row = {"op": "crawl_loop", "pages": lo["pages"], "rounds": ROUNDS,
           f"local{LO}": lo, f"local{HI}": hi,
           "speedup": round(hi["pages_per_sec"] / lo["pages_per_sec"], 2),
           "scaling_efficiency": round(eff, 3)}
    print(json.dumps(row))
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        fh.write(
            f"| CRAWL LOOP ({ROUNDS} BFS rounds, robots+politeness+dedup, "
            f"{lo['pages']} pages fetched over {HOSTS} hosts) "
            f"| {lo['pages_per_sec']} pages/s @{LO} "
            f"| {hi['pages_per_sec']} pages/s @{HI} "
            f"| speedup {row['speedup']}x "
            f"| efficiency {row['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
