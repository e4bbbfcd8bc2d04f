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

Round 5 adds a SECOND suite over the round-4 surface (graph q40-q44/q51/
q61-q65, webgraph q45-q48, crawl artifacts q54-q59) so regressions in the
new operators are tracked round-over-round like the headline 22. Protocol
difference, deliberate: the graph suite is measured WARM-BASE — the shared
sub-pipeline memo (mentions -> KG edges, host graph) is built once per run
and its cost reported separately as ``base_build``, then each query is
timed on top of the warm base. Standalone timing would re-run the same
extraction 21x and every sample would measure the matcher, not the
operator under test; warm-base isolates each operator's own cost, which is
the number that detects an operator regression. The headline suite keeps
the standalone (clear_memo per query) protocol so its totals stay
comparable with rounds 1-4.

Output-size contract (round-5 fix): the per-round driver keeps only the
LAST 2000 characters of stdout and parses the final JSON line — round 4's
line grew to ~3.5 KB (raw samples + row counts) and the driver recorded
``parsed: null``. The printed line is now a COMPACT summary hard-capped
below ``_LINE_BUDGET`` chars (``make_compact`` drops detail keys in a
documented priority order if a future suite grows past it); the full
record — raw samples, row counts, per-query graph-suite medians — is
written to ``BENCH_DETAIL.json`` next to this script instead.
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

# Round-4 surface: graph + webgraph + crawl-artifact queries, warm-base
# protocol (see module docstring). q28/q45 are the base builders and are
# timed as "base_build", not as suite members.
GRAPH_SUITE = [
    "q40_khop",
    "q41_degrees",
    "q42_pagerank",
    "q43_ntriples_export",
    "q44_pattern_match",
    "q46_anchor_dictionary",
    "q47_anchor_aliases",
    "q48_domain_graph",
    "q51_hits",
    "q54_wet_export",
    "q55_sitemap_urls",
    "q56_cdx_index",
    "q57_frontier_plan",
    "q58_robots_sitemaps",
    "q59_wat_export",
    "q61_triangles",
    "q62_cocitation",
    "q63_communities",
    "q64_weighted_pagerank",
    "q65_personalized_pagerank",
]


# Hard cap for the printed JSON line. The driver tails 2000 chars; leave
# headroom for a trailing newline and any stray log line after ours.
_LINE_BUDGET = 1800


def make_compact(out: dict) -> str:
    """One-line JSON summary of a full bench record, < _LINE_BUDGET chars.

    Keeps the driver-contract keys (metric/value/unit/queries/sf) plus the
    throughput headlines; folds the graph suite to its two scalar totals.
    If the line still exceeds the budget (e.g. a future suite triples the
    query count), detail keys are dropped in priority order — per-query
    medians go LAST since they are the driver contract's "queries" key.
    """
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "runs": out["runs"],
        "sf": out["sf"],
        "docs_per_sec": out["docs_per_sec"],
        "mentions_per_sec": out["mentions_per_sec"],
        "triples_per_sec": out["triples_per_sec"],
        "cpus": out["cpus"],
        "graph_suite_sec": out["graph_suite"]["value"],
        "graph_base_build_sec": out["graph_suite"]["base_build"],
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    for drop in ("detail", "graph_base_build_sec", "graph_suite_sec",
                 "cpus", "docs_per_sec", "mentions_per_sec", "runs",
                 "metric", "queries"):
        if len(line) <= _LINE_BUDGET:
            break
        compact.pop(drop, None)
        if drop == "metric":
            compact["metric"] = "headline suite wall time (sec)"
        line = json.dumps(compact)
    return line


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
    # --- graph/webgraph/crawl suite: warm-base protocol ---------------
    g_samples: dict[str, list[float]] = {n: [] for n in GRAPH_SUITE}
    base_samples: list[float] = []
    for r in range(runs):
        E.clear_memo()
        spark.catalog.clearCache()
        t0 = time.time()
        qs["q28_kg_edges"](spark, sf_dir).count()   # warms mentions+edges
        qs["q45_host_graph"](spark, sf_dir).count()  # warms host graph
        base_samples.append(round(time.time() - t0, 3))
        for name in GRAPH_SUITE:
            t0 = time.time()
            counts[name] = qs[name](spark, sf_dir).count()
            g_samples[name].append(round(time.time() - t0, 3))
    E.clear_memo()
    spark.catalog.clearCache()
    g_timings = {n: round(median(ts), 3) for n, ts in g_samples.items()}
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
        "graph_suite": {
            "value": round(sum(g_timings.values()), 3),
            "unit": "sec",
            "protocol": "warm-base medians of %d runs — shared KG-edge/"
                        "host-graph memo built once per run (base_build), "
                        "each operator timed on the warm base" % runs,
            "base_build": round(median(base_samples), 3),
            "base_samples": base_samples,
            "queries": g_timings,
            "samples": g_samples,
        },
    }
    spark.stop()
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=1)
    print(make_compact(out))


if __name__ == "__main__":
    main()
