"""Crawl-operator scaling: entity co-occurrence (kg/cooccur.py) and
robots.txt frontier filtering (kg/robots.py) at two pinned parallelism
levels on the same parquet inputs — the operator-level N vs 4N evidence
for the round-4 crawl additions.

Co-occurrence is the interesting one at scale: a doc-keyed self-join
whose pair expansion is quadratic per document, fed a deterministic
mentions table with a planted 25%-share head entity (the skew shape head
entities produce in real annotation output). Robots is window-heavy
(three host-partitioned windows + a ranking window) over a 100k-host
rules corpus deciding a multi-million-URL frontier.

Usage: python scripts/bench_crawlops.py
Env: CRAWLOPS_DOCS (default 400000, 12 mentions each),
     CRAWLOPS_HOSTS (default 100000), CRAWLOPS_URLS (default 1600000),
     CRAWLOPS_LO/HI (default 4/16), CRAWLOPS_PASSES (default 3),
     CRAWLOPS_INTERLEAVES (default 2), CRAWLOPS_DIR (parquet cache dir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LO = int(os.environ.get("CRAWLOPS_LO", "4"))
HI = int(os.environ.get("CRAWLOPS_HI", "16"))
N_DOCS = int(os.environ.get("CRAWLOPS_DOCS", "400000"))
N_HOSTS = int(os.environ.get("CRAWLOPS_HOSTS", "100000"))
N_URLS = int(os.environ.get("CRAWLOPS_URLS", "1600000"))
PASSES = int(os.environ.get("CRAWLOPS_PASSES", "3"))
BASE = os.environ.get("CRAWLOPS_DIR", "/tmp/quickner_crawlops")

_GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from quickner_spark.session import get_spark

n_docs, n_hosts, n_urls, base = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
spark = get_spark("crawlops-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")

# mentions: 12 per doc from a 64-surface universe; xxhash64 placement
# with a floor(sqrt) frequency ramp and a planted head entity at ~25%
# of all mentions (the skew real gazetteer annotation produces)
m = spark.range(n_docs * 12, numPartitions=128).select(
    (F.col("id") / 12).cast("long").alias("doc_id"),
    (F.abs(F.xxhash64("id")) % 4096).alias("k"))
m = m.select("doc_id", F.when(F.col("k") < 1024, F.lit("e0")).otherwise(
    F.concat(F.lit("e"), F.floor(F.sqrt("k")).cast("string")))
    .alias("surface"))
m.write.mode("overwrite").parquet(base + "/mentions")

# robots: one body per host, 8 * rules + a named group a * caller skips
h = spark.range(n_hosts, numPartitions=32).select(
    F.concat(F.lit("h"), F.col("id").cast("string"),
             F.lit(".example.com")).alias("host"),
    (F.col("id") % 10).cast("string").alias("k"))
body = F.concat(
    F.lit("# synthetic policy\nUser-agent: megabot\nDisallow: /\n\n"
          "User-agent: *\n"),
    F.lit("Disallow: /private"), F.col("k"), F.lit("/\n"),
    F.lit("Allow: /private"), F.col("k"), F.lit("/pub/\n"),
    F.lit("Disallow: /tmp\nDisallow: /cgi-bin/\nAllow: /cgi-bin/ok/\n"
          "Disallow: /search\nDisallow:\nAllow: /\n"))
h.select("host", body.alias("body")).write.mode("overwrite") \
    .parquet(base + "/robots")

# frontier: n_urls across the hosts, 4 path variants incl. disallowed,
# longest-match-allowed, and rule-less deep paths
u = spark.range(n_urls, numPartitions=64).select(
    (F.col("id") % n_hosts).cast("string").alias("hid"),
    ((F.col("id") % n_hosts) % 10).cast("string").alias("k"),
    (F.col("id") % 4).alias("v"), F.col("id").cast("string").alias("i"))
path = (F.when(F.col("v") == 0,
               F.concat(F.lit("/private"), F.col("k"), F.lit("/x/"),
                        F.col("i")))
        .when(F.col("v") == 1,
              F.concat(F.lit("/private"), F.col("k"), F.lit("/pub/"),
                       F.col("i")))
        .when(F.col("v") == 2, F.concat(F.lit("/docs/"), F.col("i")))
        .otherwise(F.concat(F.lit("/search?q="), F.col("i"))))
u.select(F.concat(F.lit("https://h"), F.col("hid"),
                  F.lit(".example.com"), path).alias("url")) \
    .write.mode("overwrite").parquet(base + "/frontier")
print("generated")
spark.stop()
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from quickner_spark.session import get_spark
from quickner_spark.kg.cooccur import cooccurrence
from quickner_spark.kg.robots import frontier_allowed, robots_rules
from quickner_spark.operators.caching import release

cores, passes, base = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(cores, 4)}g")
spark = get_spark(f"crawlops-{cores}", cores=cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
m = spark.read.parquet(base + "/mentions").repartition(cores * 4).cache()
n_m = m.count()
robots = spark.read.parquet(base + "/robots").cache()
robots.count()
urls = spark.read.parquet(base + "/frontier").repartition(cores * 4).cache()
n_u = urls.count()

res = {"cores": cores}
warm = cooccurrence(m, min_docs=2)
warm.count()
release(warm)
times, n_pairs = [], 0
for _ in range(passes):
    t0 = time.time()
    out = cooccurrence(m, min_docs=2)
    n_pairs = out.count()
    times.append(time.time() - t0)
    release(out)  # each pass pays the full distinct shuffle honestly
res["cooccur"] = {"pass_sec": [round(t, 2) for t in times],
                  "mentions_per_sec": round(n_m / min(times), 1),
                  "pairs": n_pairs}

frontier_allowed(urls, robots_rules(robots)).where("allowed").count()
times, n_allowed = [], 0
for _ in range(passes):
    t0 = time.time()
    n_allowed = (frontier_allowed(urls, robots_rules(robots))
                 .where("allowed").count())
    times.append(time.time() - t0)
res["robots"] = {"pass_sec": [round(t, 2) for t in times],
                 "urls_per_sec": round(n_u / min(times), 1),
                 "allowed": n_allowed}
print(json.dumps(res))
spark.stop()
"""


def _run(code: str, *args: str, cpus: int | None = None) -> str:
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
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return lines[-1]


def main() -> None:
    if not os.path.exists(BASE + "/frontier/_SUCCESS"):
        _run(_GEN, str(N_DOCS), str(N_HOSTS), str(N_URLS), BASE)
    runs: dict[int, list[dict]] = {LO: [], HI: []}
    for cores in (LO, HI) * int(os.environ.get("CRAWLOPS_INTERLEAVES", "2")):
        runs[cores].append(json.loads(
            _run(_WORKER, str(cores), str(PASSES), BASE, cpus=cores)))
    out_rows = []
    for op, rate_key, size in (("cooccur", "mentions_per_sec", N_DOCS * 12),
                               ("robots", "urls_per_sec", N_URLS)):
        lo = max(runs[LO], key=lambda r: r[op][rate_key])[op]
        hi = max(runs[HI], key=lambda r: r[op][rate_key])[op]
        check = "pairs" if op == "cooccur" else "allowed"
        assert lo[check] == hi[check], (op, lo, hi)
        eff = (hi[rate_key] / lo[rate_key]) / (HI / LO)
        row = {"op": op, "rows": size, f"local{LO}": lo, f"local{HI}": hi,
               "speedup": round(hi[rate_key] / lo[rate_key], 2),
               "scaling_efficiency": round(eff, 3)}
        out_rows.append(row)
        print(json.dumps(row))
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        for row in out_rows:
            op = row["op"]
            lo, hi = row[f"local{LO}"], row[f"local{HI}"]
            rate = "mentions_per_sec" if op == "cooccur" else "urls_per_sec"
            label = ("CO-OCCURRENCE (doc-keyed pair expansion, 25%-share "
                     f"head entity), {N_DOCS}x12 mentions"
                     if op == "cooccur" else
                     f"ROBOTS FRONTIER (parse windows + ranking), "
                     f"{N_HOSTS} hosts / {N_URLS} urls")
            fh.write(f"| {label} | {lo[rate]} {rate.split('_')[0]}/s @{LO} "
                     f"| {hi[rate]} {rate.split('_')[0]}/s @{HI} "
                     f"| speedup {row['speedup']}x "
                     f"| efficiency {row['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
