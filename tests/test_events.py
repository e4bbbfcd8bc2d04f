"""Event-table operator tests: windows + sessionization vs local replay."""

from __future__ import annotations

import datetime as dt

import pytest

from quickner_spark.operators import events as ev
from quickner_spark.operators import textops as tx


@pytest.fixture(scope="module")
def toy_events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        # user 1: two sessions (gap 45 min between event 2 and 3)
        (1, t0, "click", 1.0),
        (1, t0 + dt.timedelta(minutes=10), "click", 2.0),
        (1, t0 + dt.timedelta(minutes=55), "view", 3.0),
        # user 2: one session of 3 events
        (2, t0 + dt.timedelta(minutes=1), "view", 1.5),
        (2, t0 + dt.timedelta(minutes=20), "view", 2.5),
        (2, t0 + dt.timedelta(minutes=40), "click", 0.5),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")


def test_sessionize_gap_semantics(toy_events):
    s = ev.sessionize(toy_events, gap_minutes=30)
    got = {(r["user_id"], r["ts"].minute): r["session_id"]
           for r in s.collect()}
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1 and got[(1, 55)] == 2
    assert got[(2, 1)] == got[(2, 20)] == got[(2, 40)] == 1


def test_session_stats(toy_events):
    st = {r["user_id"]: r for r in ev.session_stats(toy_events).collect()}
    assert st[1]["n_sessions"] == 2 and st[1]["max_session_events"] == 2
    assert st[2]["n_sessions"] == 1 and st[2]["max_session_events"] == 3


def test_tumbling_windows(toy_events):
    w = ev.tumbling_window_stats(toy_events, minutes=10)
    rows = {(r["window_start"].minute, r["event_type"]): r["n_events"]
            for r in w.collect()}
    assert rows[(0, "click")] == 1   # t0 event
    assert rows[(10, "click")] == 1
    assert rows[(0, "view")] == 1    # user 2 minute 1
    total = sum(rows.values())
    assert total == 6


def test_quality_score_bounds(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = tx.quality_score(docs).collect()
    assert len(q) == docs.count()
    for r in q:
        assert 0 <= r["quality"] <= 100
        assert 0 <= r["stop_pct"] <= 100


def test_latest_by_key_argmax(toy_events):
    got = {r["user_id"]: (r["ts"], r["event_type"], r["value"])
           for r in ev.latest_by_key(toy_events, "user_id", "ts").collect()}
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    assert got == {
        1: (t0 + dt.timedelta(minutes=55), "view", 3.0),
        2: (t0 + dt.timedelta(minutes=40), "click", 0.5),
    }


def test_latest_by_key_tie_break_deterministic(spark):
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, "a", 9.0), (1, t, "b", 1.0), (1, t, "b", 2.0)],
        "k long, ts timestamp, s string, v double")
    # equal ts: the struct comparison falls through to (s, v) — max row
    (row,) = ev.latest_by_key(df, "k", "ts").collect()
    assert (row["s"], row["v"]) == ("b", 2.0)


def test_latest_by_key_composite_key_and_column_set(spark):
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "x", t, 1.0), (1, "x", t + dt.timedelta(1), 2.0),
         (1, "y", t, 3.0)],
        "a long, b string, ts timestamp, v double")
    out = ev.latest_by_key(df, ["a", "b"], "ts")
    assert out.columns == ["a", "b", "ts", "v"]
    assert {(r["a"], r["b"], r["v"]) for r in out.collect()} == \
        {(1, "x", 2.0), (1, "y", 3.0)}


def test_latest_by_key_differential_random(spark):
    """latest_by_key vs a pure-Python arg-max with the full-row
    lexicographic tie-break, on a seeded random table dense with ties."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(8), dt.datetime(2024, 1, 1 + rng.randrange(3)),
             rng.choice("ab"), float(rng.randrange(4)))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, s string, "
                                     "v double")
    want = {}
    for k, ts, s, v in rows:
        cand = (ts, s, v)
        if k not in want or cand > want[k]:
            want[k] = cand
    got = {r["k"]: (r["ts"], r["s"], r["v"])
           for r in ev.latest_by_key(df, "k", "ts").collect()}
    assert got == want
