"""WARC/Common-Crawl ingest throughput + scaling (sources/warc.py).

Measures the north-rule input path end-to-end: ``*.warc.gz`` archives ->
``read_warc`` (archive-per-task binaryFile scan + Arrow framing kernel)
-> fused extract+annotate -> mention count, at two pinned core counts
(N vs 4N stand-in), against a parquet-input control of the SAME corpus
through the SAME downstream kernel — so the WARC column isolates pure
ingest cost (gunzip + record framing) and its scaling.

Archives are synthesized DISTRIBUTEDLY (one archive per task via
``repartition(M)`` + a mapInPandas writer using ``warc_record_bytes``),
so the fixture generation itself follows the archive-per-task model.

Usage: python scripts/bench_warc.py
Env: WARC_DOCS (default 200000), WARC_SENTS (12), WARC_ARCHIVES (256),
     WARC_LO/WARC_HI (4/16), WARC_BASE.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("WARC_DOCS", "200000"))
SENTS = int(os.environ.get("WARC_SENTS", "12"))
N_ARCHIVES = int(os.environ.get("WARC_ARCHIVES", "256"))
LO = int(os.environ.get("WARC_LO", "4"))
HI = int(os.environ.get("WARC_HI", "16"))
BASE = os.environ.get("WARC_BASE", "/tmp/quickner_warc_bench")


def _gen() -> None:
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
import os
from pyspark.sql import functions as F
from quickner_spark.session import get_spark
from quickner_spark.kg import corpus

spark = get_spark("warc-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
pages = corpus.synth_pages(spark, {N_DOCS}, seed=42, gaz_size=999,
                           partitions=128, sents_per_page={SENTS})
pages.write.mode("overwrite").parquet({BASE!r} + "/pages")

pages = spark.read.parquet({BASE!r} + "/pages")
out_dir = {BASE!r} + "/warc"
os.makedirs(out_dir, exist_ok=True)

def kern(batches):
    import pandas as pd
    from pyspark import TaskContext
    from quickner_spark.sources.warc import warc_record_bytes, \
        write_warc_file
    pid = TaskContext.get().partitionId()
    recs = []
    for pdf in batches:
        for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            date = pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
            recs.append(warc_record_bytes(url, date, bytes(html)))
    if recs:
        path = os.path.join(out_dir, f"part-{{pid:05d}}.warc.gz")
        write_warc_file(path, recs)
        yield pd.DataFrame({{"path": [path], "n": [len(recs)]}})

written = (pages.repartition({N_ARCHIVES})
           .mapInPandas(kern, "path string, n long"))
print("archives:", written.count(), "records:",
      written.agg(F.sum("n")).first()[0])
spark.stop()
"""
    r = subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True, text=True, timeout=3600)
    print(r.stdout.strip().splitlines()[-1], file=sys.stderr)


def _leg(cores: int, fmt: str) -> dict:
    code = f"""
import sys, time, json; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from quickner_spark.session import get_spark
from quickner_spark.kg import corpus
from quickner_spark.kg.extract import extract_annotate_stage
from quickner_spark.sources.warc import read_warc

spark = get_spark("warc-bench", cores={cores},
                  shuffle_partitions={2 * cores})
spark.sparkContext.setLogLevel("ERROR")
gaz = corpus.synth_gazetteer(999, 42)
if {fmt!r} == "warc":
    pages = read_warc(spark, {BASE!r} + "/warc", path_glob="*.warc.gz")
else:
    pages = spark.read.parquet({BASE!r} + "/pages")
t = time.time()
row = (extract_annotate_stage(pages, gaz, window=18)
       .agg(F.count("*").alias("pages"),
            F.sum(F.size("spans")).alias("mentions")).first())
wall = time.time() - t
print(json.dumps({{"wall": round(wall, 2), "pages": row["pages"],
                   "mentions": row["mentions"]}}))
spark.stop()
"""
    r = subprocess.run(["taskset", "-c", f"0-{cores - 1}",
                        sys.executable, "-c", code],
                       check=True, capture_output=True, text=True,
                       timeout=3600)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if not os.path.isdir(f"{BASE}/warc"):
        shutil.rmtree(BASE, ignore_errors=True)
        _gen()
    gz_mb = sum(os.path.getsize(os.path.join(f"{BASE}/warc", f))
                for f in os.listdir(f"{BASE}/warc")) / 1e6

    res = {}
    # interleave lo/hi to average time-varying box noise
    for fmt in ("warc", "parquet"):
        for cores in (LO, HI):
            key = f"{fmt}@{cores}"
            res[key] = _leg(cores, fmt)
            print(f"{key}: {res[key]}", file=sys.stderr)
    assert res[f"warc@{LO}"]["mentions"] == res[f"parquet@{LO}"]["mentions"], \
        "WARC and parquet legs disagree on mention count"

    def eff(fmt):
        lo, hi = res[f"{fmt}@{LO}"]["wall"], res[f"{fmt}@{HI}"]["wall"]
        return round(lo / hi / (HI / LO), 3)

    print(json.dumps({
        "metric": "WARC ingest -> fused extract+annotate, N vs 4N",
        "docs": N_DOCS, "sents_per_page": SENTS,
        "archives": N_ARCHIVES, "gz_mb": round(gz_mb, 1),
        "legs": res,
        "warc_scaling_efficiency": eff("warc"),
        "parquet_scaling_efficiency": eff("parquet"),
        "warc_vs_parquet_hi": round(
            res[f"warc@{HI}"]["wall"] / res[f"parquet@{HI}"]["wall"], 3),
        "warc_pages_per_sec_hi": round(
            res[f"warc@{HI}"]["pages"] / res[f"warc@{HI}"]["wall"]),
        "warc_gz_mb_per_sec_hi": round(gz_mb / res[f"warc@{HI}"]["wall"], 1),
    }))


if __name__ == "__main__":
    main()
