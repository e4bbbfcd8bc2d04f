"""Incremental-update cost (kg/delta.py::SnapshotKg): full build vs a
small-changed-fraction update vs a no-op update, at bench scale.

The claim under measurement: after snapshot 0, the cost of ingesting a new
crawl snapshot is ~(digest diff over all pages) + (full pipeline over the
CHANGED pages only) + (gazetteer-bounded aggregate merge) — NOT another
full rebuild. The changed pages' html carries an appended comment, so the
extracted text (and therefore every aggregate) is unchanged — the run
asserts nodes/edges are row-identical after the update, a correctness
check the benchmark gets for free.

Usage: python scripts/bench_delta.py
Env: DELTA_DOCS (default 400000), DELTA_SENTS (12), DELTA_PCT (default 1,
     percent of pages changed), DELTA_CORES (16), DELTA_BASE.

Prints one JSON line: walls + pages/s for init / delta-update / no-op,
and update_vs_rebuild (the headline ratio).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quickner_spark.kg import corpus  # noqa: E402
from quickner_spark.kg.delta import SnapshotKg  # noqa: E402
from quickner_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("DELTA_DOCS", "400000"))
SENTS = int(os.environ.get("DELTA_SENTS", "12"))
PCT = int(os.environ.get("DELTA_PCT", "1"))
CORES = int(os.environ.get("DELTA_CORES", "16"))
BASE = os.environ.get("DELTA_BASE", "/tmp/quickner_delta_bench")


def _rows(df):
    return sorted(map(tuple, ((tuple(v) if isinstance(v, list) else v
                               for v in r) for r in df.collect())))


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark("delta-bench", cores=CORES,
                      shuffle_partitions=2 * CORES)
    spark.sparkContext.setLogLevel("ERROR")
    gaz = corpus.synth_gazetteer(999, 42)

    a_path = f"{BASE}/pages_a"
    corpus.synth_pages(spark, N_DOCS, seed=42, gaz_size=999,
                       partitions=4 * CORES, sents_per_page=SENTS
                       ).write.parquet(a_path)
    # snapshot B: PCT% of pages carry an appended html comment — changed
    # bytes, identical extracted text
    b_path = f"{BASE}/pages_b"
    a = spark.read.parquet(a_path)
    hit = F.pmod(F.xxhash64("url"), F.lit(100)) < PCT
    (a.withColumn("html",
                  F.when(hit, F.concat("html",
                                       F.lit(bytearray(b"<!-- r2 -->"))))
                  .otherwise(F.col("html")))
     .write.parquet(b_path))
    n_changed_expected = a.where(hit).count()

    kg = SnapshotKg(spark, f"{BASE}/kg", gaz, corpus.PREDICATES)

    t = time.time()
    s0 = kg.update(spark.read.parquet(a_path))
    wall_init = time.time() - t
    assert s0 == {"snap": 0, "pages_in": N_DOCS, "changed": N_DOCS,
                  "committed": True, "aliases_reused": False}, s0
    nodes0, edges0 = _rows(kg.nodes()), _rows(kg.edges())
    n_triples = kg.current_triples().count()

    t = time.time()
    s1 = kg.update(spark.read.parquet(b_path))
    wall_delta = time.time() - t
    assert s1["changed"] == n_changed_expected and s1["committed"], s1
    assert _rows(kg.nodes()) == nodes0, "nodes changed on a no-text delta"
    assert _rows(kg.edges()) == edges0, "edges changed on a no-text delta"

    t = time.time()
    s2 = kg.update(spark.read.parquet(b_path))
    wall_noop = time.time() - t
    assert s2["changed"] == 0 and not s2["committed"], s2

    print(json.dumps({
        "metric": "incremental snapshot update vs full rebuild",
        "docs": N_DOCS, "sents_per_page": SENTS, "cores": CORES,
        "changed_pct": PCT, "changed_pages": n_changed_expected,
        "triples": n_triples,
        "init_sec": round(wall_init, 1),
        "delta_update_sec": round(wall_delta, 1),
        "noop_update_sec": round(wall_noop, 1),
        "update_vs_rebuild": round(wall_delta / wall_init, 3),
        "noop_vs_rebuild": round(wall_noop / wall_init, 3),
        "init_pages_per_sec": round(N_DOCS / wall_init),
        "nodes_edges_identical": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
