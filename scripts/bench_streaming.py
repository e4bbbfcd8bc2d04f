"""Streaming KG at bench scale (round-4 item): replay a 400k-page crawl
through the incremental KG stream (streaming/kg_stream.py) in bounded
micro-batches, and prove the three claims that matter at corpus scale:

1. THROUGHPUT — sustained pages/s through extract → annotate → maximal →
   triples with per-batch idempotent commits (reported at the configured
   core count);
2. BATCH EQUALITY — the final mentions/triples tables are row-identical
   to one batch run over the union (checked distributedly via exceptAll,
   not a driver collect);
3. RECOVERY — stop the stream mid-replay, restart from the checkpoint,
   and measure time-to-first-committed-batch after restart; the restarted
   run must complete to the same tables.

Outputs one JSON line; numbers go into BENCH_SCALING.md.

Usage: python scripts/bench_streaming.py
Env: STREAM_DOCS (default 400000), STREAM_SENTS (default 4),
     STREAM_CORES (default 16), STREAM_FILES (default 32),
     STREAM_FILES_PER_TRIGGER (default 4), STREAM_BASE.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickner_spark.kg import corpus  # noqa: E402
from quickner_spark.session import get_spark  # noqa: E402
from quickner_spark.streaming.kg_stream import (incremental_kg,  # noqa: E402
                                                kg_batch_increment)

N_DOCS = int(os.environ.get("STREAM_DOCS", "400000"))
SENTS = int(os.environ.get("STREAM_SENTS", "4"))
CORES = int(os.environ.get("STREAM_CORES", "16"))
N_FILES = int(os.environ.get("STREAM_FILES", "32"))
PER_TRIGGER = int(os.environ.get("STREAM_FILES_PER_TRIGGER", "4"))
BASE = os.environ.get("STREAM_BASE", "/tmp/quickner_stream_bench")
GAZ_SIZE = 999


def _stream(spark, src, schema, out, tag):
    s = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", PER_TRIGGER).parquet(src))
    gaz = corpus.synth_gazetteer(GAZ_SIZE, 42)
    return incremental_kg(
        s, gaz, corpus.PREDICATES,
        os.path.join(out, f"mentions_{tag}"),
        os.path.join(out, f"triples_{tag}"),
        checkpoint_dir=os.path.join(out, f"ckpt_{tag}"))


def main() -> None:
    spark = get_spark("stream-bench", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)
    src = os.path.join(BASE, "pages")
    full = corpus.synth_pages(spark, N_DOCS, seed=42, gaz_size=GAZ_SIZE,
                              partitions=N_FILES, sents_per_page=SENTS)
    full.write.mode("overwrite").parquet(src)
    full = spark.read.parquet(src)
    schema = full.schema

    # --- 1. full replay throughput -------------------------------------
    t0 = time.time()
    q = _stream(spark, src, schema, BASE, "a")
    q.awaitTermination()
    wall = round(time.time() - t0, 1)
    n_batches = len([f for f in os.listdir(
        os.path.join(BASE, "ckpt_a", "commits")) if not f.startswith(".")])
    triples_a = spark.read.parquet(os.path.join(BASE, "triples_a"))
    mentions_a = spark.read.parquet(os.path.join(BASE, "mentions_a"))
    n_triples = triples_a.count()

    # --- 2. batch equality (distributed) --------------------------------
    bm, bt = kg_batch_increment(full, corpus.synth_gazetteer(GAZ_SIZE, 42),
                                corpus.PREDICATES)
    # each exceptAll direction would recompute the whole batch increment —
    # pin both twins once
    bm = bm.localCheckpoint()
    bt = bt.localCheckpoint()

    def identical(stream_df, batch_df) -> bool:
        s = stream_df.drop("batch_id")
        return (s.exceptAll(batch_df).count() == 0
                and batch_df.exceptAll(s).count() == 0)
    mentions_equal = identical(mentions_a, bm)
    triples_equal = identical(triples_a, bt)

    # --- 3. stop mid-replay, restart from checkpoint ---------------------
    kill_after = max(1, n_batches // 2)
    q2 = _stream(spark, src, schema, BASE, "b")
    while True:
        p = q2.lastProgress
        done = len([f for f in os.listdir(
            os.path.join(BASE, "ckpt_b", "commits"))
            if not f.startswith(".")]) if os.path.isdir(
            os.path.join(BASE, "ckpt_b", "commits")) else 0
        if done >= kill_after:
            q2.stop()
            q2.awaitTermination()
            break
        time.sleep(0.5)
    t0 = time.time()
    q3 = _stream(spark, src, schema, BASE, "b")
    first_commit = None
    base_done = kill_after
    while q3.isActive:
        done = len([f for f in os.listdir(
            os.path.join(BASE, "ckpt_b", "commits"))
            if not f.startswith(".")])
        if first_commit is None and done > base_done:
            first_commit = round(time.time() - t0, 1)
        time.sleep(0.25)
    q3.awaitTermination()
    recovery_total = round(time.time() - t0, 1)
    triples_b = spark.read.parquet(os.path.join(BASE, "triples_b"))
    resumed_equal = identical(triples_b, bt)

    out = {
        "job": "incremental KG stream replay at bench scale",
        "n_docs": N_DOCS, "sents_per_page": SENTS, "cores": CORES,
        "n_batches": n_batches, "files_per_trigger": PER_TRIGGER,
        "wall_sec": wall,
        "pages_per_sec": round(N_DOCS / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
        "n_triples": n_triples,
        "mentions_equal_batch": mentions_equal,
        "triples_equal_batch": triples_equal,
        "killed_after_batches": kill_after,
        "recovery_first_commit_sec": first_commit,
        "recovery_total_sec": recovery_total,
        "resumed_equal_batch": resumed_equal,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
