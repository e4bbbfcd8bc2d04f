"""bench.py printed-line contract: the per-round driver tails the LAST
2000 characters of stdout and json-parses the final line. Round 4's line
grew to ~3.5 KB and the driver recorded ``parsed: null`` (BENCH_r04.json),
losing the round's headline numbers. ``make_compact`` guarantees the
printed line fits; this test pins that invariant with realistic (and
adversarially inflated) inputs — no Spark session needed.
"""

import json

import bench


def _full_record(n_headline=22, n_graph=20, runs=3):
    """Synthesize a full bench record shaped like main() builds."""
    q = {f"q{i:02d}_some_operator_name_{i}": 12.345 for i in range(n_headline)}
    g = {f"q{40 + i}_graph_operator_{i}": 3.456 for i in range(n_graph)}
    return {
        "metric": "headline suite wall time (mention extraction, dedup, "
                  "similarity, triples, components) at sf0.1 — per-query "
                  f"medians of {runs} runs, production (xxhash64) "
                  "configuration",
        "value": round(sum(q.values()), 3),
        "unit": "sec",
        "queries": q,
        "samples": {k: [12.3, 12.4, 12.5] for k in q},
        "runs": runs,
        "sf": 0.1,
        "docs_per_sec": 7849.3,
        "mentions_per_sec": 129000.0,
        "triples_per_sec": 581.7,
        "cpus": 32,
        "rows": {k: 82173 for k in q},
        "graph_suite": {
            "value": round(sum(g.values()), 3),
            "unit": "sec",
            "protocol": "warm-base medians",
            "base_build": 3.8,
            "base_samples": [3.7, 3.8, 3.9],
            "queries": g,
            "samples": {k: [3.4, 3.5, 3.6] for k in g},
        },
    }


def test_compact_line_fits_driver_tail():
    line = bench.make_compact(_full_record())
    assert len(line) < bench._LINE_BUDGET
    assert "\n" not in line
    parsed = json.loads(line)
    # driver-contract keys survive
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert len(parsed["queries"]) == 22
    assert parsed["graph_suite_sec"] == _full_record()["graph_suite"]["value"]


def test_compact_line_drops_detail_before_contract_keys():
    # A pathological future suite: 60 headline queries with long names.
    rec = _full_record(n_headline=60)
    line = bench.make_compact(rec)
    assert len(line) < bench._LINE_BUDGET
    parsed = json.loads(line)
    # value/unit/sf are never dropped; queries goes last.
    for key in ("value", "unit", "sf"):
        assert key in parsed


def test_compact_line_never_includes_raw_samples():
    parsed = json.loads(bench.make_compact(_full_record()))
    assert "samples" not in parsed
    assert "rows" not in parsed
    assert "graph_suite" not in parsed  # folded to two scalars
