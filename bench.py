"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...,
 "mentions_per_sec": ..., "triples_per_sec": ...}

Each query is forced with a count() so the measured time covers the whole
plan execution (scan -> compute -> agg), not plan construction.

Measurement hygiene (round-4 fixes for the round-3 verdict findings):
* every query runs ``RUNS`` times (default 3, $SPARK_GRAFT_BENCH_RUNS) and
  the PER-QUERY MEDIAN is reported — BASELINE.md documents a 35-85 s
  noisy-box band on single runs, and medians make round-over-round
  comparisons interpretable without band forensics;
* the PRODUCTION configuration is measured: queries that switch to the
  md5 "portable" hash family for the DuckDB correctness oracle (q14/q15/
  q24/...) are benched via ``__spark_entry__.production_queries()``
  (xxhash64, float64 centroids) so the headline number tracks what
  production runs, not the oracle's portability tax.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from quickner_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_mentions",
    "q02_label_histogram",
    "q05_entity_index",
    "q06_filter_valid",
    "q07_exact_dedup",
    "q08_token_stats",
    "q10_ngram_jaccard_pairs",
    "q11_knn_quantized_ip",
    "q12_triples",
    "q13_components",
    "q14_minhash_dedup",
    "q15_simhash",
    "q17_lang_id",
    "q18_embedding_dups",
    "q20_event_windows",
    "q21_sessions",
    "q22_quality_score",
    "q23_fingerprint",
    "q24_ivf_knn",
    "q25_repeated_blocks",
    "q27_link_scores",
    "q29_maximal_mentions",
]


def main() -> None:
    from statistics import median

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("quickner-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # production configuration, not the oracle's portable-hash twins
    qs = {**E.queries(), **E.production_queries()}
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    counts: dict[str, int] = {}
    # warm the JVM/python workers once so q01 doesn't absorb startup cost
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in range(runs):
        for name in HEADLINE:
            # each timed query pays its FULL standalone cost: the shared
            # sub-pipeline memo (mentions/KG edges/host graph) would
            # otherwise let later queries ride earlier queries' caches
            E.clear_memo()
            t0 = time.time()
            counts[name] = qs[name](spark, sf_dir).count()
            samples[name].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()  # q12/q13 etc. cache mentions per call
    timings = {name: round(median(ts), 3) for name, ts in samples.items()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (mention extraction, dedup, "
                  "similarity, triples, components) at sf" + str(sf)
                  + f" — per-query medians of {runs} runs, production "
                  "(xxhash64) configuration",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(n_docs / timings["q01_mentions"], 1),
        "mentions_per_sec": round(counts["q01_mentions"] / timings["q01_mentions"], 1),
        "triples_per_sec": round(counts["q12_triples"] / timings["q12_triples"], 1),
        "cpus": cpus,
        "rows": counts,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
