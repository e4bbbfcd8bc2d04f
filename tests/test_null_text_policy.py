"""NULL-text policy (round-5 robustness sweep over NULL-bearing clones).

At web scale some rows always arrive with NULL text (failed fetches,
empty captures, decode errors). The engine's documented policy:

* per-doc METRICS keep the row with defined outputs — ``lang_id`` ->
  ('und', NULL hits), ``quality_score`` -> the no-signal base (NULL
  percents' components 0, length_ok 0);
* SKETCHES drop the row (a NULL fingerprint cannot participate in dedup
  and would only ride shuffles) — ``simhash64``;
* STRUCTURED sinks keep the row carrying an explicit JSON null
  (``jsonl_lines``/``spacy_lines`` — dropping documents in a sink is
  silent data loss); POSITIONAL sinks drop it (``conll_lines`` — an
  empty CoNLL block reads as a spurious sentence boundary);
* ``snapshot_delta`` excludes NULL digests on BOTH sides — a NULL
  manifest digest otherwise reads as key-absence and the page
  reclassifies 'new' (reprocesses) on every snapshot.

The full 68-query oracle gate over a NULL-bearing clone of the testdata
(text NULL for doc_id%5==0) agrees with these semantics; this file pins
them at unit cost.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickner_spark.operators import textops as tx
from quickner_spark.sinks.formats import (conll_lines, jsonl_lines,
                                          spacy_lines)
from quickner_spark.kg.delta import snapshot_delta


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "the spark data engine"), (2, None), (3, "hash join sort")],
        "doc_id long, text string")


def test_simhash_drops_null_text(docs):
    out = tx.simhash64(docs, hash_family="portable")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_lang_id_null_text_is_und_with_null_hits(docs):
    rows = {r["doc_id"]: r for r in tx.lang_id(docs).collect()}
    assert rows[2]["lang_guess"] == "und"
    assert rows[2]["lang_hits"] is None
    assert rows[1]["lang_guess"] == "en" and rows[1]["lang_hits"] > 0


def test_quality_score_null_text_no_signal_base(docs):
    rows = {r["doc_id"]: r for r in tx.quality_score(docs).collect()}
    r = rows[2]
    assert r["n_chars_text"] is None and r["n_tokens"] is None
    assert r["stop_pct"] == 0 and r["punct_pct"] == 0
    # composite: 0 (stop) + 0 (distinct) + 20 (no punct noise) + 0 (len)
    assert r["quality"] == 20


def test_json_sinks_keep_null_text_rows(docs):
    d = docs.withColumn("label", F.expr(
        "cast(array() as array<struct<start:long,end:long,label:string>>)"
    )).withColumnRenamed("doc_id", "id")
    j = {r["id"]: r["value"]
         for r in jsonl_lines(d, keep_cols=("id",)).collect()}
    assert j[2] == '{"id":2,"text":null,"label":[]}'
    s = {r["id"]: r["value"]
         for r in spacy_lines(d, keep_cols=("id",)).collect()}
    assert s[2] == '[null,{"entity":[]}]'


def test_conll_sink_drops_null_text_rows(docs):
    d = docs.withColumn("label", F.expr(
        "cast(array() as array<struct<start:long,end:long,label:string>>)"))
    out = conll_lines(d, keep_cols=("doc_id",))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_similarity_ops_drop_null_vectors(spark):
    """NULL embeddings are dropped at every similarity entry point — a
    None element otherwise NULL-poisons the JVM aggregates (q16's oracle
    collapsed to 0 rows) or crashes the NumPy kernels outright
    (np.stack/np.array over an inhomogeneous batch in the block GEMM)."""
    from quickner_spark.operators import simsearch as ss
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    top = ss.topk_quantized_ip(vecs, k=2, probe_ids=[1])
    assert sorted(r["neighbor_id"] for r in top.collect()) == [3, 4]
    dups = ss.embedding_dup_pairs(vecs, threshold_pct=95, n_blocks=2)
    assert [(r["id_a"], r["id_b"]) for r in dups.collect()] == [(1, 3)]
    lsh = ss.lsh_dup_pairs(vecs, threshold_pct=95)
    assert {(r["id_a"], r["id_b"]) for r in lsh.collect()} <= {(1, 3)}
    ivf = ss.ivf_topk(vecs, k=1, probe_ids=[1], nlist=2, nprobe=2)
    assert all(r["neighbor_id"] != 2 for r in ivf.collect())


def test_similarity_ops_drop_nonfinite_vectors(spark):
    """A single NaN component ABORTS the whole job under ANSI mode
    (round(NaN).cast(long) -> CAST_OVERFLOW) — at corpus scale one bad
    upstream model output must not kill the stage. Non-finite vectors
    are dropped at the same boundary as NULLs."""
    from quickner_spark.operators import simsearch as ss
    nan, inf = float("nan"), float("inf")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [nan, 0.0]), (3, [1.0, 0.0]),
         (4, [inf, 1.0]), (5, [0.0, -inf])],
        "vec_id long, embedding array<float>")
    top = ss.topk_quantized_ip(vecs, k=4, probe_ids=[1])
    assert sorted(r["neighbor_id"] for r in top.collect()) == [3]
    dups = ss.embedding_dup_pairs(vecs, threshold_pct=95, n_blocks=2)
    assert [(r["id_a"], r["id_b"]) for r in dups.collect()] == [(1, 3)]


def test_event_time_ops_drop_null_timestamps(spark):
    """Events without a timestamp cannot be placed on the time axis:
    tumbling windows drop them (Spark's window() already does — the
    filter makes it explicit), and sessionize MUST drop them because
    NULL ordering is engine-defined (NULLS FIRST vs LAST), which would
    make the neighbors' session ids nondeterministic too."""
    from quickner_spark.operators.events import (sessionize,
                                                 tumbling_window_stats)
    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 7, "a", 1.0),
         (2, None, 7, "a", 2.0),
         (3, "2026-01-01 01:00:00", 7, "a", 3.0)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double").withColumn("ts", F.to_timestamp("ts"))
    w = tumbling_window_stats(ev)
    assert w.count() == 2 and w.agg(F.sum("n_events")).first()[0] == 2
    s = sessionize(ev)
    rows = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert rows == {1: 1, 3: 2}  # 60-min gap > 30 -> two sessions; no id 2


def test_uniform_dim_contract(spark):
    """Mixed vector lengths null-pad through zip_with into silent NULL
    scores (or crash the NumPy Lloyd/GEMM kernels). dim_histogram is
    the audit; the LSH/IVF entry points enforce conformance against the
    inferred dimensionality."""
    from quickner_spark.operators import simsearch as ss
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0]), (3, [1.0, 0.0]),
         (4, [0.0, 1.0, 5.0])],
        "vec_id long, embedding array<float>")
    h = {r["dim"]: r["n_rows"] for r in ss.dim_histogram(vecs).collect()}
    assert h == {2: 2, 1: 1, 3: 1}
    lsh = ss.lsh_dup_pairs(vecs, threshold_pct=95)
    assert {(r["id_a"], r["id_b"]) for r in lsh.collect()} <= {(1, 3)}
    ivf = ss.ivf_topk(vecs, k=2, probe_ids=[1], nlist=2, nprobe=2)
    assert [r["neighbor_id"] for r in ivf.collect()] == [3]


def test_key_violations_audit(spark):
    """The unique-key table contract is enforced at INGEST (loader text
    dedup, WARC latest-by-url), not re-paid per query; key_violations is
    the audit for untrusted tables — empty result == contract holds."""
    from quickner_spark.operators.indexes import key_violations
    clean = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "doc_id long, text string")
    assert key_violations(clean, "doc_id").count() == 0
    dirty = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "conflict"), (2, "b")],
        "doc_id long, text string")
    rows = key_violations(dirty, "doc_id").collect()
    assert [(r["doc_id"], r["n_rows"]) for r in rows] == [(1, 3)]
    # ingest-side enforcement example: WARC's latest_by_key restores it
    from quickner_spark.operators.events import latest_by_key
    fixed = latest_by_key(dirty.withColumn("ts", F.col("doc_id")),
                          "doc_id", "ts")
    assert key_violations(fixed, "doc_id").count() == 0


def test_snapshot_delta_excludes_null_digests(spark):
    old = spark.createDataFrame(
        [("a", "d1"), ("b", None)], "url string, digest string")
    new = spark.createDataFrame(
        [("a", "d1x"), ("b", None), ("c", "d3")],
        "url string, digest string")
    rows = {r["url"]: r["status"]
            for r in snapshot_delta(new, old).collect()}
    # 'b' is excluded outright — previously its NULL manifest digest read
    # as key-absence and it reclassified 'new' every snapshot
    assert rows == {"a": "changed", "c": "new"}
