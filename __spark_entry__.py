"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 (plus the training-data
extensions) is exposed as a ``queries()`` entry over the driver-generated
testdata tables, with a DuckDB ``oracle_sql()`` twin that expresses the SAME
semantics in ANSI SQL. The document corpus is single-spaced lowercase ASCII
([a-z0-9 ]), for which the reference boundary cascade (quickner-core/src/
quickner.rs:137-222) reduces exactly to::

    (start == 0 OR prev ∈ ws∪punct) AND (next ∈ ws∪punct)   -- rules a-c,e,f
    OR start + len(name) == len(text)                        -- rule d

which the oracle encodes position-by-position via a lateral
``generate_series`` scan (an O(n·m) literal restatement — intentionally a
*different algorithm* than the engine's automaton, so agreement is evidence).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from quickner_spark.filters import Filters
from quickner_spark.operators.annotate import (
    annotate_documents, annotate_mentions, maximal_mentions,
    normalize_gazetteer)
from quickner_spark.sources.loaders import infer_gazetteer
from quickner_spark.operators import indexes as ix
from quickner_spark.operators import textops as tx
from quickner_spark.operators import simsearch as ss
from quickner_spark.operators.graph import connected_components
from quickner_spark.operators import events as ev
from quickner_spark.kg.triples import pattern_triples, window_triples
from quickner_spark.kg.link import alias_table_from_gazetteer, link_mentions
from quickner_spark.operators.hashing import (
    MIX_M, MIX_P, minhash_mix_constants)

# ---------------------------------------------------------------------------
# Shared fixtures: a fixed gazetteer over the testdata vocabulary.
# "hash" vs "hash join" exercises overlapping-pattern emission (M1).
# ---------------------------------------------------------------------------
GAZETTEER: list[tuple[str, str]] = [
    ("spark", "TOOL"),
    ("hash join", "OP"),
    ("hash", "KW"),
    ("merge", "OP"),
    ("sort", "OP"),
    ("window", "OP"),
    ("customer", "ENT"),
    ("vector", "ENT"),
    ("stream", "ENT"),
    ("data", "ENT"),
]
STOPWORDS = ("the", "a")
# Competing link candidates: "hash" is both its own entity and an alias of
# "hash join"; "stream" both its own and an alias of "data" — so the
# argmax over (prior, context-overlap) is actually exercised.
EXTRA_ALIASES = {"hash join": ["hash"], "data": ["stream"]}
PREDICATES = ("join", "scan")  # connective tokens for triple patterns
VALID_FILTERS = Filters(min_length=150, max_length=300, punctuation=True)
KNN_PROBES = [0, 1, 2, 3, 4]

# Boundary char class for the ASCII corpus: Unicode ws (ASCII subset) +
# ASCII punctuation — matches matcher.WHITE_SPACE/ASCII_PUNCTUATION on this
# corpus.
_BND = r"^[ \t\n\r!-/:-@[-`{-~]$"


def _spread(df: DataFrame) -> DataFrame:
    """The sf0.001-0.1 test tables arrive as a single parquet split, which
    would serialize every narrow in-row stage (matcher UDF, shingling,
    signatures) onto one core. Fan out to the session's parallelism when —
    and only when — the scan yields fewer splits; at real scale the scan
    has thousands of splits and this is a no-op (no shuffle added)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# Per-(session, sf_dir) memo for the shared sub-pipeline builds. The
# graph/webgraph queries (q40-q44/q46-q48/q51/q61-q65) all start from the
# same two intermediates — the q28 KG edges and the q45 host graph, which
# in turn share the matcher's mention table — so without a memo a 65-query
# gate re-runs the extraction ~12x. Entries are cached+counted once and
# reused verbatim (zero semantic change: same DataFrame object, same plan).
# Benchmarks that need standalone per-query cost call clear_memo() between
# measured queries.
_MEMO: dict[tuple, DataFrame] = {}


def _memo(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    app = spark.sparkContext.applicationId
    k = (app, sf_dir, key)
    df = _MEMO.get(k)
    if df is None:
        # evict entries from dead sessions so restarts don't accumulate
        for stale in [s for s in _MEMO if s[0] != app]:
            del _MEMO[stale]
        df = build().cache()
        df.count()
        _MEMO[k] = df
    return df


def clear_memo() -> None:
    """Unpersist and drop every memoized intermediate (bench hygiene)."""
    for df in _MEMO.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _MEMO.clear()


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        gaz = normalize_gazetteer(GAZETTEER, case_sensitive=False)
        return annotate_mentions(_docs(spark, sf_dir), gaz,
                                 id_col="doc_id", text_col="text",
                                 case_sensitive=False)
    return _memo(spark, sf_dir, "mentions", build)


def _gaz_values_sql() -> str:
    rows = ", ".join(f"('{n}', '{l}')"
                     for n, l in normalize_gazetteer(GAZETTEER))
    return f"gaz(name, label) AS (VALUES {rows})"


def _mentions_cte() -> str:
    """CTEs: gaz, d (lowercased docs), mentions — reference-mode boundary
    semantics for an ASCII corpus (see module docstring)."""
    return f"""
{_gaz_values_sql()},
d AS (SELECT doc_id, lower(text) AS text FROM documents),
raw AS (
  SELECT d.doc_id, d.text, g.name, g.label, p.pos
  FROM d CROSS JOIN gaz g,
  LATERAL (SELECT unnest(generate_series(1, greatest(length(d.text) - length(g.name) + 1, 0))) AS pos) p
  WHERE substring(d.text, p.pos, length(g.name)) = g.name
),
mentions AS (
  SELECT doc_id,
         CAST(pos - 1 AS BIGINT) AS "start",
         CAST(pos - 1 + length(name) AS BIGINT) AS "end",
         label, name AS surface
  FROM raw
  WHERE ((pos = 1 OR regexp_matches(substring(text, pos - 1, 1), '{_BND}'))
         AND (pos + length(name) <= length(text)
              AND regexp_matches(substring(text, pos + length(name), 1), '{_BND}')))
     OR (pos - 1 + length(name) = length(text))
)""".strip()


# ---------------------------------------------------------------------------
# queries() — Spark implementations
# ---------------------------------------------------------------------------

def q01_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M3 + F5: full mention extraction (SURVEY §2.5)."""
    return _mentions(spark, sf_dir)


def q02_label_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (SURVEY §2.6)."""
    return ix.label_histogram(_mentions(spark, sf_dir))


def q03_docs_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (SURVEY §2.7): case-sensitive label lookup."""
    return ix.docs_by_label(_mentions(spark, sf_dir), "OP")


def q04_docs_by_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (SURVEY §2.7): case-insensitive surface lookup."""
    return ix.docs_by_entity(_mentions(spark, sf_dir), "Spark")


def q05_entity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (SURVEY §2.6): surface -> distinct-doc count."""
    return ix.entity_index(_mentions(spark, sf_dir))


def q06_filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3 (SURVEY §2.3) as pushed-down Column predicates."""
    docs = _docs(spark, sf_dir)
    return docs.where(VALID_FILTERS.spark_predicate(F.col("text"))).select("doc_id")


def q07_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (A4 generalized; training-data op). The corpus has
    no exact duplicates, so dedup runs over documents UNION ALL documents —
    every text then forms a group of 2 and the digest/keep-id/count logic is
    fully exercised."""
    docs = _docs(spark, sf_dir)
    return tx.exact_dup_groups(docs.unionAll(docs))


def q08_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality-score inputs (training-data op)."""
    return tx.token_stats(_docs(spark, sf_dir), stopwords=STOPWORDS)


def q09_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus aggregation by language (scan->hash agg)."""
    return (_docs(spark, sf_dir).groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.max("n_chars").alias("max_chars")))


def q10_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: exact word-trigram Jaccard >= 0.8 via
    prefix-filtered set-similarity join (AllPairs/PPJoin family; exact —
    differentially tested equal to the full inverted-index join)."""
    return tx.jaccard_pairs_prefix(_docs(spark, sf_dir), n=3, threshold_pct=80)


def q11_knn_quantized_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 neighbors by integer-quantized inner product."""
    out = ss.topk_quantized_ip(_emb(spark, sf_dir), k=5, probe_ids=KNN_PROBES)
    return out.select("probe_id", "neighbor_id",
                      F.col("rank").cast("long").alias("rank"), "score")


def q12_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule triple extraction: mention-pair + connective pattern.
    Mentions come from the memoized (cached+counted) build: the self-join
    references the mapInPandas stage twice and must not run the matcher
    twice."""
    docs = _docs(spark, sf_dir)
    m = _mentions(spark, sf_dir)
    return pattern_triples(m, docs, PREDICATES)


def q13_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule canonicalization: connected components over the
    adjacent-surface co-occurrence graph (iterative min-label propagation;
    oracle is a recursive-CTE transitive closure)."""
    m = _mentions(spark, sf_dir)  # memoized: materialized before the self-join
    m1 = m.select("doc_id", F.col("end").alias("e"), F.col("surface").alias("u"))
    m2 = m.select("doc_id", F.col("start").alias("s"), F.col("surface").alias("v"))
    edges = (m1.join(m2, "doc_id")
             .where((F.col("s") == F.col("e") + 1) & (F.col("u") != F.col("v")))
             .select("u", "v").distinct())
    return connected_components(edges, "u", "v").select("node", "component")


def q14_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banded near-dup candidates, exact-verified — run in the
    PORTABLE hash family (md5-derived affine mixes, hashing.py) so the
    DuckDB oracle reproduces signatures, band buckets, candidates and the
    verified pairs bit-for-bit. Production default stays xxhash64 (same
    plan shape; recall vs q10 asserted in tests/test_textops.py)."""
    return tx.minhash_dedup(_docs(spark, sf_dir), n=3, num_hashes=64,
                            bands=16, threshold_pct=80,
                            hash_family="portable")


def q15_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 fingerprints in the PORTABLE hash family (bits 0..59 from
    the low md5 half, 60..63 from the high half) — oracle-exact in DuckDB.
    Production default stays xxhash64."""
    return tx.simhash64(_docs(spark, sf_dir), hash_family="portable")


def q16_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH, PORTABLE mode: md5
    plane signs + integer-quantized projections (sign test exact) and
    integer-exact quantized-cosine re-scoring (one IEEE division per pair),
    so ranks AND scores are oracle-comparable. Recall vs exact cosine is
    asserted in tests/test_simsearch.py on the production (xxhash64)
    configuration."""
    out = ss.lsh_topk(_emb(spark, sf_dir), k=5, probe_ids=KNN_PROBES,
                      n_planes=4, n_tables=16,
                      hash_family="portable", score="quantized")
    return out.select("probe_id", "neighbor_id",
                      F.col("rank").cast("long").alias("rank"), "cosine")


def q17_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword profiles, argmax with deterministic
    tie-break; training-data op)."""
    return tx.lang_id(_docs(spark, sf_dir))


def q18_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, integer-exact quantized predicate."""
    return ss.embedding_dup_pairs(_emb(spark, sf_dir), threshold_pct=40)


def q19_salted_entity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 via salted two-stage aggregation (skew path) — must equal q05."""
    return ix.entity_index_salted(_mentions(spark, sf_dir))


def q20_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (batch twin of the streaming
    windowed counts)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.tumbling_window_stats(events, minutes=10)


def q21_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (lag + cumsum window) -> per-user session stats."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.session_stats(events, gap_minutes=30)


def q22_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (integer/percent heuristics)."""
    return tx.quality_score(_docs(spark, sf_dir), stopwords=STOPWORDS)


def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprints (min token-digest per 8-token
    block; md5-hex digests so the oracle computes the identical set).

    The operator returns ``fingerprint array<string>``; the driver-facing
    query flattens it to a comma-joined scalar so the harness canonicalizer
    (pandas sort_values) can hash it — list-valued cells are unhashable."""
    out = tx.fingerprint(_docs(spark, sf_dir), window=8)
    return out.select("doc_id",
                      F.concat_ws(",", "fingerprint").alias("fingerprint"))


def q24_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF cells, PORTABLE mode (the last query to
    gain a full oracle): md5-seeded coarse quantizer whose Lloyd updates
    produce INTEGER centroids — ``floor(double(Σx·res)/double(n))`` is one
    exact int64 sum, two exact int→double conversions, one IEEE division
    and a floor, all bit-deterministic cross-engine — so assignment,
    probing, candidates AND the quantized-cosine scores restate exactly
    in DuckDB. This closes the float-MEAN summation-order gap that kept
    q24 rows-only through round 3. Production default stays xxhash64 +
    float64 centroids (recall/determinism pinned in
    tests/test_simsearch.py)."""
    out = ss.ivf_topk(_emb(spark, sf_dir), k=5, probe_ids=KNN_PROBES,
                      nlist=16, nprobe=4, iters=2, hash_family="portable")
    return out.select("probe_id", "neighbor_id",
                      F.col("rank").cast("long").alias("rank"), "cosine")


def q25_repeated_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 16-token blocks (boilerplate/template
    detection; chunk-level exact dedup)."""
    return tx.repeated_blocks(_docs(spark, sf_dir), block=16, min_count=2)


def q26_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events property bag (semi-structured
    web-log shape): get_json_object stays inside codegen; only
    (event_type, k) reach the aggregate."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


def q27_link_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule entity-link candidate scoring (kg/link.py): broadcast
    alias table, score = log1p(prior) + |doc tokens ∩ canonical profile|,
    argmax per mention via max_by. Score exported as round(score*1000)
    (prior∈{10,100} + integer overlap keeps it far from .5 boundaries, so
    the cast is engine-stable)."""
    docs = _docs(spark, sf_dir)
    m = _mentions(spark, sf_dir)
    al = alias_table_from_gazetteer(spark, normalize_gazetteer(GAZETTEER),
                                    EXTRA_ALIASES)
    out = link_mentions(m, docs, al)
    return out.select(
        "doc_id", "start", "end", "surface", "canonical_id", "label",
        F.round(F.col("score") * 1000).cast("long").alias("score_milli"))


def q28_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule KG edge materialization (kg/pipeline.py s_edges shape):
    triples joined to a broadcast alias->canonical map on both endpoints,
    then weighted groupBy(src, dst, pred). The map resolves each alias to
    its max-(prior, canonical) candidate. Memoized per (session, sf_dir):
    nine downstream graph queries start from this table."""
    def build() -> DataFrame:
        docs = _docs(spark, sf_dir)
        m = _mentions(spark, sf_dir)
        t = pattern_triples(m, docs, PREDICATES)
        al = alias_table_from_gazetteer(spark,
                                        normalize_gazetteer(GAZETTEER),
                                        EXTRA_ALIASES)
        amap = (al.groupBy("alias")
                .agg(F.max_by("canonical_id",
                              F.struct("prior", "canonical_id")).alias("cid")))
        subj_map = amap.selectExpr("alias AS subj", "cid AS src")
        obj_map = amap.selectExpr("alias AS obj", "cid AS dst")
        return (t.join(F.broadcast(subj_map), "subj")
                .join(F.broadcast(obj_map), "obj")
                .groupBy("src", "dst", "pred")
                .agg(F.count("*").alias("weight")))
    return _memo(spark, sf_dir, "kg_edges", build)


def q29_maximal_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-match mention resolution (operators/annotate.py
    maximal_mentions; the triple stage's input): drop mentions strictly
    contained in a longer mention of the same doc — 'hash' inside
    'hash join' goes, equal-span different-label survive. Left-anti
    self-join on the doc key with a containment range condition."""
    m = _mentions(spark, sf_dir)  # memoized: anti-join reads it twice
    return maximal_mentions(m)


def q30_inferred_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5 gazetteer inference (sources/loaders.py, quickner.rs:609-621):
    surface of every span re-extracted from the STORED text by char
    offsets, lowercased, set-deduped. Differentially proves
    substring(text, start, end-start) round-trips the matcher's span
    offsets; the oracle reads the surface column directly."""
    gaz = normalize_gazetteer(GAZETTEER, case_sensitive=False)
    annotated = annotate_documents(_docs(spark, sf_dir), gaz,
                                   case_sensitive=False)
    return infer_gazetteer(annotated)


def q31_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via LSH bucketing (scale path of q18): bucket
    self-join candidates verified with the identical integer predicate —
    emitted rows are a proven subset of q18 (tests/test_simsearch.py
    asserts subset + recall>=0.7). PORTABLE mode (md5 plane signs +
    quantized projections) so the full bucket->candidate->verify chain is
    oracle-exact in DuckDB; production default stays xxhash64."""
    return ss.lsh_dup_pairs(_emb(spark, sf_dir), threshold_pct=40,
                            n_planes=4, n_tables=16,
                            hash_family="portable")


def q32_conll_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 distributed CoNLL writer (sinks/formats.py::conll_lines,
    models.rs:123-165 heuristic): annotate the corpus, order spans by
    (start, end, label), render each document's token\\tlabel block as one
    ``value`` string, all via JVM-side higher-order functions. The oracle
    restates the tagging relationally (first word containing each span's
    surface, later spans overwrite) — agreement proves the export logic,
    not just the writer plumbing."""
    from quickner_spark.sinks.formats import conll_lines

    m = _mentions(spark, sf_dir)
    lab = (m.groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("start").cast("int").alias("start"),
               F.col("end").cast("int").alias("end"),
               F.col("label")))).alias("label")))
    docs = (_docs(spark, sf_dir)
            .select("doc_id", F.lower("text").alias("text"))
            .join(lab, "doc_id", "left"))
    return conll_lines(docs, keep_cols=("doc_id",))


def q33_brat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 distributed brat .ann writer (sinks/formats.py::brat_lines,
    models.rs:104-121): per-document ``T{i}\\t{label}\\t{start}\\t{end}\\t
    {surface}`` lines with the counter resetting per document, spans
    ordered (start, end, label). The oracle restates the numbering with a
    window row_number — agreement proves the per-doc counter and the
    char-offset surface slicing."""
    from quickner_spark.sinks.formats import brat_lines

    m = _mentions(spark, sf_dir)
    lab = (m.groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("start").cast("int").alias("start"),
               F.col("end").cast("int").alias("end"),
               F.col("label")))).alias("label")))
    docs = (_docs(spark, sf_dir)
            .select("doc_id", F.lower("text").alias("text"))
            .join(lab, "doc_id", "left"))
    _, ann = brat_lines(docs, keep_cols=("doc_id",))
    return ann


def q34_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup DECISION step (textops.dup_clusters): exact trigram-Jaccard
    near-dup pairs -> connected components -> (doc_id, cluster_id, keep)
    for EVERY document (singletons keep themselves). Deterministic and
    hash-independent; the oracle closes the pair graph with a recursive
    CTE and left-joins back to documents."""
    return tx.dup_clusters(_docs(spark, sf_dir), n=3, threshold_pct=80)


def q35_window_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple extraction via the per-mention text WINDOW (the pipeline's
    scale path, kg/triples.py::window_triples): each mention carries
    ``nxt`` — the max(len(pred))+2 characters after the span — and the
    connective test is a codegen-able ``startswith`` on that column, so
    the triple join never touches the document table. In the KG pipeline
    the fused annotate stage emits ``nxt`` for free (an O(1)-indexed
    Python slice); here it is attached relationally so the oracle can
    restate the identical window in SQL. Results are definitionally
    equal to q12 (pattern_triples) — the driver gate proving BOTH forms
    hash-exact against independent oracles pins the rewrite."""
    docs = _docs(spark, sf_dir)
    m = _mentions(spark, sf_dir)
    width = max(len(p) for p in PREDICATES) + 2
    mw = (m.join(docs.select("doc_id",
                             F.lower("text").alias("__t")).hint("merge"),
                 "doc_id")
          .withColumn("nxt", F.col("__t").substr(F.col("end") + 1,
                                                 F.lit(width)))
          .drop("__t"))
    return window_triples(mw, PREDICATES)


def _labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents joined with their (start, end, label)-sorted span arrays —
    the shared input shape of the export sinks (q32/q33/q36/q37)."""
    m = _mentions(spark, sf_dir)
    lab = (m.groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("start").cast("int").alias("start"),
               F.col("end").cast("int").alias("end"),
               F.col("label")))).alias("label")))
    return (_docs(spark, sf_dir)
            .select("doc_id", F.lower("text").alias("text"))
            .join(lab, "doc_id", "left"))


def q36_jsonl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 distributed JSONL writer (sinks/formats.py::jsonl_lines,
    models.rs:80-90): one serde-compact ``{"id":…,"text":"…","label":
    [[s,e,"L"],…]}`` line per document, offsets unquoted, assembled
    JVM-side. The oracle restates the byte layout with string
    concatenation — agreement proves the encoding, not just the writer
    plumbing."""
    from quickner_spark.sinks.formats import jsonl_lines

    return jsonl_lines(_labeled_docs(spark, sf_dir)
                       .withColumnRenamed("doc_id", "id"),
                       keep_cols=("id",)).withColumnRenamed("id", "doc_id")


def q37_spacy_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 distributed spaCy-envelope writer (sinks/formats.py::
    spacy_lines, models.rs:57-78): one ``["text",{"entity":[[s,e,"L"],…]}]``
    element per document — joining rows with "," inside brackets
    reproduces ``to_spacy``'s single array byte-for-byte (pinned by
    tests/test_sinks.py)."""
    from quickner_spark.sinks.formats import spacy_lines

    d = _labeled_docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
    return spacy_lines(d, keep_cols=("id",)).withColumnRenamed("id", "doc_id")


def q38_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max snapshot dedup (operators/events.py::latest_by_key): the
    LATEST event per user — the same operator the WARC/Common-Crawl
    ingest uses to keep one capture per revisited url
    (sources/warc.py::latest_by_url). ``max_by(struct(row), struct(ts,
    …))`` with a map-side partial arg-max, ~|keys| rows shuffled (plans
    as SortAggregate — struct buffers aren't hash-aggregable — but the
    sorts are local; the window form shuffles+sorts every input row).
    Deterministic under ts ties: the
    struct comparison falls through to the remaining row, which the
    oracle restates as the matching ORDER BY ... DESC chain."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.latest_by_key(events, "user_id", "ts")


def q39_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot delta classification (kg/delta.py::snapshot_delta):
    the skip/reprocess decision the incremental KG store
    (``SnapshotKg.update``) makes per url — one doc-keyed left join of
    the new snapshot's content digests against the previous manifest,
    keeping only 'new' and 'changed' keys. Staged here on the documents
    table: the "old" snapshot omits the ``doc_id % 11 == 0`` slice (those
    classify as new) and the "new" snapshot carries appended text for
    ``doc_id % 7 == 0`` (those classify as changed). md5 digests so the
    oracle computes bit-identical hashes (production uses xxhash64 over
    the html bytes)."""
    from quickner_spark.kg.delta import snapshot_delta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = (docs.where(F.col("doc_id") % 11 != 0)
           .select("doc_id", F.md5("text").alias("digest")))
    new = docs.select(
        "doc_id",
        F.md5(F.when(F.col("doc_id") % 7 == 0,
                     F.concat(F.col("text"), F.lit("X")))
              .otherwise(F.col("text"))).alias("digest"))
    return snapshot_delta(new, old, key_col="doc_id")


KHOP_SEEDS = ("spark", "data")


def q40_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph query over the materialized KG: 2-hop neighborhoods of two
    seed canonicals (operators/graph.py::k_hop — frontier-expansion BFS,
    per-level work |frontier ⋈ edges|, min-dist semantics via the
    per-level anti-join). The oracle unrolls the two levels as CTEs with
    the same NOT-EXISTS minimality condition."""
    from quickner_spark.operators.graph import k_hop

    return k_hop(q28_kg_edges(spark, sf_dir), list(KHOP_SEEDS), 2)


def q41_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph query over the materialized KG: per-node degree/weight table
    (operators/graph.py::degree_stats — two map-side-combined aggregates
    + one node-sized outer join)."""
    from quickner_spark.operators.graph import degree_stats

    return degree_stats(q28_kg_edges(spark, sf_dir), weight="weight")


def q42_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node importance over the materialized KG: 3 fixed PageRank
    iterations in INTEGER arithmetic (operators/graph.py::pagerank) —
    int64 ranks at scale 10^9, integer-division contributions, so the
    result is bit-identical on any engine regardless of aggregation
    order (the quantized-scoring trick applied to an iterative graph
    algorithm; production default is double). Dangling mass not
    redistributed — documented operator variant, restated identically
    by the oracle's unrolled CTEs."""
    from quickner_spark.operators.graph import pagerank

    return pagerank(q28_kg_edges(spark, sf_dir), iters=3,
                    arithmetic="integer")


def q43_ntriples_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG interchange export (sinks/formats.py::ntriples_lines): the
    materialized edges as W3C N-Triples lines — IRI percent-encoding of
    the canonical ids (min-alias canonicals may contain spaces) done
    JVM-side as a codegen-able replace chain; the oracle restates the
    same concat/replace chain, so agreement proves the ENCODING, not
    just the plumbing."""
    from quickner_spark.sinks.formats import ntriples_lines

    return ntriples_lines(q28_kg_edges(spark, sf_dir))


# basic graph pattern for q44: a 3-pattern chain over the KG edges —
# two 'join' hops then a 'scan' hop; each element is a constant or '?var'
BGP_PATTERNS = (("?a", "join", "?b"), ("?b", "join", "?c"),
                ("?c", "scan", "?d"))


def q44_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive graph-pattern query (SPARQL-BGP core) over the
    materialized KG (operators/graph.py::match_patterns): each pattern is
    a constant-filtered projection of the edge table (predicate pushed to
    the scan), patterns equi-join on shared variable bindings in greedy
    most-selective-first order — never a cartesian product for a
    connected BGP. Bag semantics; the oracle restates the same three
    scans joined with USING on the shared variables."""
    from quickner_spark.operators.graph import match_patterns

    return match_patterns(q28_kg_edges(spark, sf_dir), BGP_PATTERNS,
                          subj="src", pred="pred", obj="dst")


def _synth_link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages-with-anchors table derived from ``documents``
    for the hyperlink-graph query: every resolution branch of
    kg/weblinks.py (absolute+fragment, scheme-relative, path-absolute,
    host-root relative, mailto) appears, quote styles mixed, with a
    parity-gated duplicate anchor so edge weights exceed 1. Constructed
    with the SAME concat expression the oracle restates, so q45 verifies
    extraction+resolution+aggregation, not the synthesis."""
    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = lambda m: (i % m).cast("string")  # noqa: E731
    return d.select(
        F.concat(F.lit("https://d"), s(7), F.lit(".example.com/docs/"),
                 i.cast("string")).alias("url"),
        F.concat(
            F.lit('<nav><a href="/about">about</a> <a href=\'p/'), s(5),
            F.lit('\'>rel</a></nav><p><a href="https://h'), s(11),
            F.lit('.example.org/x#sec">ext</a>'),
            F.when(i % 2 == 0,
                   F.concat(F.lit('<a href="https://h'), s(11),
                            F.lit('.example.org/y">again</a>'))
                   ).otherwise(F.lit("")),
            F.lit("<a href='//cdn"), s(3),
            F.lit(".example.net/a.js'>cdn</a>"),
            F.lit('<a href="mailto:a@b.c">mail</a></p>')).alias("html"))


def q45_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level hyperlink graph (kg/weblinks.py — the Common-Crawl
    webgraph shape): regexp anchor scan + explode (zero shuffle), the
    simplified-RFC-3986 resolution CASE, and one output-bounded
    (src_host, dst_host) count with a map-side partial aggregate.
    ``keep_self=True`` so the path-absolute / relative branches stay
    observable in the result; the oracle restates scan, resolution, and
    grouping over the identically-constructed html. Memoized per
    (session, sf_dir): q48/q51/q64 and the crawl-family queries re-read
    this graph."""
    from quickner_spark.kg.weblinks import extract_links, host_graph

    def build() -> DataFrame:
        return host_graph(extract_links(_synth_link_pages(spark, sf_dir)),
                          keep_self=True)
    return _memo(spark, sf_dir, "host_graph", build)


def q46_anchor_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text alias-prior dictionary (kg/weblinks.py::
    anchor_dictionary — the CrossWikis shape): normalized anchor string ×
    destination host counts with a per-anchor rank (1 = dominant sense,
    count-desc then host tie-break). Paired href+text capture via
    arrays_zip, output-bounded pair count behind a map-side partial
    aggregate, rank window over the AGGREGATED table only. Integer
    columns throughout, so the oracle (same scan, same resolution CASE,
    row_number with the same ordering) is value-exact."""
    from quickner_spark.kg.weblinks import anchor_dictionary

    return anchor_dictionary(_synth_link_pages(spark, sf_dir))


# homepage seed for q47: the even external hosts of _synth_link_pages,
# each attributed to a known canonical entity
ANCHOR_SEED_HOSTS = tuple(
    (f"h{k}.example.org", f"web_h{k}", "ORG") for k in range(0, 11, 2))


def q47_anchor_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-discovered entity aliases (kg/weblinks.py::aliases_from_anchors
    — homepage seeding, the CrossWikis loop): anchors whose top-3
    destination host is attributed to a known entity become alias rows in
    the exact (alias, canonical_id, label, prior) shape link_mentions
    consumes, prior = anchor count. The seed table is broadcast, so the
    plan adds no shuffle beyond the dictionary's own two."""
    from quickner_spark.kg.weblinks import aliases_from_anchors

    seed = spark.createDataFrame(
        list(ANCHOR_SEED_HOSTS), "host string, canonical_id string, "
                                 "label string")
    return aliases_from_anchors(q46_anchor_dictionary(spark, sf_dir), seed,
                                min_links=2, max_rank=3)


def q48_domain_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level webgraph (kg/weblinks.py::domain_graph — Common
    Crawl's second derived graph): the q45 host graph folded to
    registered domains (last-2-labels with the ccSLD 3-label CASE),
    intra-domain edges dropped. The fold's input is the already
    output-bounded host graph, so the re-aggregate never touches the
    corpus. Oracle restates the label arithmetic on string_split."""
    from quickner_spark.kg.weblinks import domain_graph

    return domain_graph(q45_host_graph(spark, sf_dir))


def q49_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-revisit URL canonicalization (kg/weblinks.py::normalize_url):
    four per-doc variants of the same resource — case-shifted scheme/host,
    default port, tracking params, shuffled param order, fragment —
    collapse to one canonical string; the query groups by the canonical
    and counts survivors (4 per item, tail partials). Pure Column work;
    the oracle restates every rule (lower, port-strip CASE, param
    filter+sort via list_filter/list_sort) in DuckDB."""
    from quickner_spark.kg.weblinks import normalize_url

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = F.floor(i / 4).cast("long").cast("string")
    v = i % 4
    # every variant carries the param 'c=3?x' (a second '?' INSIDE the
    # query — legal per RFC 3986) so the gate exercises the
    # split-at-FIRST-'?' rule cross-engine, in a different position each
    # time; all four still collapse to one canonical
    url = (F.when(v == 0, F.concat(
               F.lit("https://example.com/item/"), k,
               F.lit("?a=1&b=2&c=3?x")))
           .when(v == 1, F.concat(
               F.lit("HTTPS://Example.Com:443/item/"), k,
               F.lit("?b=2&c=3?x&a=1")))
           .when(v == 2, F.concat(
               F.lit("https://example.com/item/"), k,
               F.lit("?a=1&utm_campaign=z&c=3?x&b=2#frag")))
           .otherwise(F.concat(
               F.lit("https://example.com:443/item/"), k,
               F.lit("?gclid=1&c=3?x&b=2&a=1"))))
    return (d.select(normalize_url(url).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_variants")))


def q50_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-signal extraction (kg/pagemeta.py::page_meta — title, robots
    meta, noindex flag, rel=canonical) in ONE decoded scan pass, zero
    shuffle. Pages synthesized from documents with quote-style and
    presence variants per doc; the oracle restates all three regexps on
    the identically-constructed html."""
    from quickner_spark.kg.pagemeta import page_meta

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    url = F.concat(F.lit("https://m"), (i % 5).cast("string"),
                   F.lit(".example.com/p/"), i.cast("string"))
    robots = (F.when(i % 3 == 0,
                     F.lit('<meta name="robots" '
                           'content="NOINDEX, nofollow">'))
              .when(i % 3 == 1,
                    F.lit("<meta name='robots' content='index, follow'>"))
              .otherwise(F.lit("")))
    canon = (F.when(i % 2 == 0,
                    F.concat(F.lit("<link rel='canonical' href='/p/"),
                             i.cast("string"), F.lit("'>")))
             .otherwise(F.lit("")))
    pages = d.select(url.alias("url"), F.concat(
        F.lit("<html><head><title>Doc "), i.cast("string"),
        F.lit(" overview</title>"), robots, canon,
        F.lit("</head><body><p>x</p></body></html>")).alias("html"))
    return page_meta(pages)


def q51_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubs/authorities over the host-level webgraph
    (operators/graph.py::hits — Kleinberg HITS, 2 fixed iterations in
    INTEGER arithmetic): int64 scores at scale 10^9, L1 normalization
    via the overflow-safe two-step integer division, so the result is
    bit-identical on any engine regardless of aggregation order (the
    q42 integer-pagerank trick applied to the two-sided hub/authority
    update). Self-loop host edges dropped (host_graph default) — a
    host's nav links say nothing about its hub quality; the memoized
    keep_self q45 graph is reused with the self-loops filtered out,
    which is identical because the filter is on the group keys.
    Production default is double arithmetic."""
    from quickner_spark.operators.graph import hits

    hg = q45_host_graph(spark, sf_dir).where(
        F.col("src_host") != F.col("dst_host"))
    return hits(hg, src="src_host", dst="dst_host",
                iters=2, arithmetic="integer")


def q52_robots_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness filtering (kg/robots.py): parse synthesized
    robots.txt bodies (named-agent group ignored by a ``*`` caller,
    consecutive-User-agent group sharing, comments, empty Disallow
    dropped) into a rules table, then decide a 5-variant frontier —
    longest-match precedence, Allow-beats-Disallow tie, prefix edge
    (``/pub`` does not match rule ``/pub/``), fragment ignored,
    rule-less hosts allowed. The oracle restates the line explosion,
    the two grouping windows, and the ranking window."""
    from quickner_spark.kg.robots import frontier_allowed, robots_rules

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 10).cast("string")
    host = F.concat(F.lit("h"), k, F.lit(".example.com"))
    body = F.concat(
        F.lit("# policy\nUser-agent: gptbot\nDisallow: /\n\n"
              "User-agent: *\nDisallow: /p"), k,
        F.lit("/\nAllow: /p"), k,
        F.lit("/pub/\nDisallow: /news\nDisallow:\n"),
        F.when((i % 10) % 2 == 0,
               F.lit("\nUser-agent: newsbot\nUser-agent: *\n"
                     "Allow: /news/")).otherwise(F.lit("")))
    robots = d.select(host.alias("host"), body.alias("body")).distinct()
    v = i % 5
    path = (F.when(v == 0, F.concat(F.lit("/p"), k, F.lit("/x/"),
                                    i.cast("string")))
            .when(v == 1, F.concat(F.lit("/p"), k, F.lit("/pub/"),
                                   i.cast("string")))
            .when(v == 2, F.concat(F.lit("/news/"), i.cast("string")))
            .when(v == 3, F.concat(F.lit("/"), i.cast("string")))
            .otherwise(F.concat(F.lit("/p"), k, F.lit("/pub"))))
    urls = d.select(F.concat(F.lit("https://"), host, path).alias("url"))
    return frontier_allowed(urls, robots_rules(robots))


def q53_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-occurrence statistics (kg/cooccur.py) over the full
    mentions extraction: per unordered surface pair, documents
    containing both + each side's document frequency + the corpus doc
    count — the KG's second edge signal (feeds PMI/NPMI edge weights;
    the float scores stay in ``with_npmi``, outside the integer
    oracle). Doc-keyed pair expansion, map-side-combined counts,
    ``min_docs=2`` output pruning."""
    from quickner_spark.kg.cooccur import cooccurrence

    m = _mentions(spark, sf_dir).select(
        "doc_id", F.lower("surface").alias("surface"))
    return cooccurrence(m, min_docs=2)


def q54_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl WET export (sinks/formats.py::wet_lines): one WARC
    conversion record per extracted page, Content-Length in UTF-8 BYTES
    (octet_length vs DuckDB strlen — the text carries a planted 2-byte
    'é' so a character-count bug cannot hash-match), NULL-text pages
    (extractor-dropped) skipped. One JVM concat per page; the oracle
    restates the record layout verbatim."""
    from quickner_spark.sinks.formats import wet_lines

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    pages = d.select(
        F.concat(F.lit("https://w"), (i % 9).cast("string"),
                 F.lit(".example.com/p/"), i.cast("string")).alias("url"),
        F.concat(F.lit("2025-03-0"), ((i % 9) + 1).cast("string"),
                 F.lit("T08:00:00Z")).alias("warc_ts"),
        F.when(i % 17 == 0, F.lit(None).cast("string"))
         .otherwise(F.concat(F.col("text"), F.lit(" é"))).alias("text"))
    return wet_lines(pages)


def q55_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery (kg/weblinks.py::extract_sitemap_urls): <loc>
    extraction from urlset/sitemapindex XML — entity-decoded ampersands,
    CDATA unwrap, case-insensitive tags, whitespace trim, is_index flag
    (parity-gated index documents). One regexp scan + explode, zero
    shuffle; the oracle restates the scan on identical bodies."""
    from quickner_spark.kg.weblinks import extract_sitemap_urls

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 6).cast("string")
    s = i.cast("string")
    urlset = F.concat(
        F.lit("<urlset><url><loc>https://s"), k, F.lit(".org/p/"), s,
        F.lit("?a=1&amp;b=2</loc></url><url><LOC> https://s"), k,
        F.lit(".org/q/"), s,
        F.lit(" </LOC></url><url><loc><![CDATA[https://s"), k,
        F.lit(".org/c/"), s, F.lit("]]></loc></url></urlset>"))
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://s"), k,
        F.lit(".org/maps/"), s,
        F.lit(".xml</loc></sitemap></sitemapindex>"))
    maps = d.select(
        F.concat(F.lit("https://s"), k, F.lit(".org/sitemap"), s,
                 F.lit(".xml")).alias("url"),
        F.when(i % 20 == 0, index).otherwise(urlset).alias("body"))
    return extract_sitemap_urls(maps)


def _cdx_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic capture table exercising every surt_key rule: case
    folding, wwwN strip, default-port strip vs non-default keep,
    userinfo drop, fragment drop, query-param sort, empty path."""
    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = i.cast("string")
    k = (i % 5).cast("string")
    url = (F.when(i % 7 == 0, F.concat(F.lit("https://WWW.Ex"), k,
                                       F.lit(".COM/P/"), s,
                                       F.lit("?b=2&a=1#frag")))
           .when(i % 7 == 1, F.concat(F.lit("http://www2.ex"), k,
                                      F.lit(".com:80/p/"), s))
           .when(i % 7 == 2, F.concat(F.lit("https://u:p@ex"), k,
                                      F.lit(".com:443/Q/"), s))
           .when(i % 7 == 3, F.concat(F.lit("http://ex"), k,
                                      F.lit(".com:8080/r/"), s, F.lit("?")))
           .when(i % 7 == 4, F.concat(F.lit("https://sub.ex"), k,
                                      F.lit(".com")))
           .otherwise(F.concat(F.lit("https://ex"), k, F.lit(".com/z/"), s,
                               F.lit("?c=3&B=2&a=1"))))
    return d.select(
        url.alias("url"),
        F.concat(F.lit("2025-03-0"), ((i % 9) + 1).cast("string"),
                 F.lit("T08:00:0"), (i % 10).cast("string"),
                 F.lit("Z")).alias("warc_ts"),
        F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>"))
         .cast("binary").alias("html"))


def q56_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ URL-index export (sinks/formats.py::cdxj_lines +
    kg/weblinks.py::surt_key): one 'SURT key, 14-digit ts, JSON block'
    line per capture. Oracle mode uses the md5 digest twin (DuckDB has
    no sha1; md5-over-UTF-8 agrees between F.md5(binary) and DuckDB
    md5(varchar)); production default is sha1 (q56 prod twin)."""
    from quickner_spark.sinks.formats import cdxj_lines

    return cdxj_lines(_cdx_pages(spark, sf_dir), digest="md5")


def q56_cdx_index_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quickner_spark.sinks.formats import cdxj_lines

    return cdxj_lines(_cdx_pages(spark, sf_dir), digest="sha1")


def _robots57(spark: SparkSession, sf_dir: str):
    """Robots corpus + frontier for q57: per-host Crawl-delay variants
    (decimal, min-across-groups, junk dropped, named-agent delay
    invisible to *), one disallowed path family, priority column."""
    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 10).cast("string")
    host = F.concat(F.lit("h"), k, F.lit(".example.com"))
    body = F.concat(
        F.lit("User-agent: gptbot\nCrawl-delay: 30\nDisallow: /\n\n"
              "User-agent: *\nDisallow: /p"), k, F.lit("/\n"),
        F.when(i % 10 % 3 == 0, F.lit("Crawl-delay: 2.5\n"))
         .when(i % 10 % 3 == 1, F.lit("Crawl-delay: 4\n"))
         .otherwise(F.lit("")),
        F.when(i % 10 % 2 == 0,
               F.lit("\nUser-agent: newsbot\nUser-agent: *\n"
                     "Crawl-delay: 1\nCrawl-delay: junk\n"
                     "Allow: /news/\n")).otherwise(F.lit("")))
    robots = d.select(host.alias("host"), body.alias("body")).distinct()
    s = i.cast("string")
    v = i % 4
    path = (F.when(v == 0, F.concat(F.lit("/p"), k, F.lit("/x/"), s))
            .when(v == 1, F.concat(F.lit("/a/"), s))
            .when(v == 2, F.concat(F.lit("/news/"), s))
            .otherwise(F.concat(F.lit("/b/"), s)))
    urls = d.select(F.concat(F.lit("https://"), host, path).alias("url"),
                    (i % 7).cast("int").alias("prio"))
    return robots, urls


def q57_frontier_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-scheduled crawl frontier (kg/robots.py::plan_frontier
    composing robots_rules + crawl_delays + frontier_allowed): per-host
    fetch order by (priority DESC, url), budget_per_host=20 cap, and
    fetch_offset_s = (rank-1)·Crawl-delay (min across governing groups,
    2.5/4↓1/default-1.0 variants; a named agent's 30 stays invisible to
    the ``*`` caller; junk values drop). The oracle restates the group
    machinery with the delay kind regex, the min-aggregate, and both
    ranking windows; the offset's single int→double multiply is
    IEEE-exact on both engines."""
    from quickner_spark.kg.robots import (crawl_delays, plan_frontier,
                                          robots_rules)

    robots, urls = _robots57(spark, sf_dir)
    return plan_frontier(urls, robots_rules(robots),
                         crawl_delays(robots), priority_col="prio",
                         budget_per_host=20)


def q58_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap directives from robots.txt (kg/robots.py::
    robots_sitemaps): global scan — case-insensitive directive name,
    comments stripped, group structure irrelevant (a Sitemap line
    inside a named group still counts, per the sitemaps.org protocol).
    Chains into extract_sitemap_urls (q55) as the crawl's discovery
    path."""
    from quickner_spark.kg.robots import robots_sitemaps

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 10).cast("string")
    host = F.concat(F.lit("h"), k, F.lit(".example.com"))
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /x/\n"
              "Sitemap: https://h"), k,
        F.lit(".example.com/sitemap.xml # primary\n"),
        F.when(i % 10 % 2 == 0,
               F.concat(F.lit("User-agent: bot\nsitemap:https://h"), k,
                        F.lit(".example.com/extra.xml\n")))
         .otherwise(F.lit("")))
    return robots_sitemaps(
        d.select(host.alias("host"), body.alias("body")).distinct())


def q59_wat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl WAT export (sinks/formats.py::wat_lines): one WARC
    metadata record per page, JSON payload = head signals (q50's
    title/robots/canonical regexps) + the IN-ROW anchor-href array (no
    join against the exploded links table). The planted 'é' in the
    title pins Content-Length as BYTES of the payload (strlen vs
    octet_length); absent signals serialize as empty strings and
    no-anchor pages as an empty links array."""
    from quickner_spark.sinks.formats import wat_lines

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = i.cast("string")
    k = (i % 6).cast("string")
    html = F.concat(
        F.lit("<html><head><TITLE>Doc "), s, F.lit(" é</TITLE>"),
        F.when(i % 4 == 0,
               F.lit('<meta name="robots" content="NOINDEX, nofollow">'))
         .otherwise(F.lit("")),
        F.when(i % 5 == 0,
               F.concat(F.lit('<link rel="canonical" href="https://c'), k,
                        F.lit(".org/p/"), s, F.lit('">')))
         .otherwise(F.lit("")),
        F.lit("</head><body>"),
        F.when(i % 7 == 0, F.lit("no anchors here"))
         .otherwise(F.concat(
             F.lit('<a href="/l/'), s, F.lit('">x</a> <A HREF="https://o'),
             k, F.lit(".org/y/"), s, F.lit('">y</A>'))),
        F.lit("</body></html>"))
    pages = d.select(
        F.concat(F.lit("https://w"), k, F.lit(".example.org/p/"), s)
         .alias("url"),
        F.concat(F.lit("2025-03-0"), ((i % 9) + 1).cast("string"),
                 F.lit("T09:00:00Z")).alias("warc_ts"),
        html.cast("binary").alias("html"))
    return wat_lines(pages)


def q60_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-charset sniffing (kg/pagemeta.py::charset_of): HTML5
    meta-charset (quoted and unquoted) takes precedence over the legacy
    http-equiv content-type form; absent declaration yields ''. The
    per-row decode dispatch (decode_pages) is the pytest-covered Python
    half; this query pins the column-level sniff the kernel mirrors."""
    from quickner_spark.kg.pagemeta import charset_of

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = i.cast("string")
    html = (F.when(i % 4 == 0, F.concat(
                F.lit('<html><head><META CHARSET="ISO-8859-1"><title>t'),
                s, F.lit("</title></head></html>")))
            .when(i % 4 == 1, F.concat(
                F.lit("<html><head><meta charset=utf-8><title>t"), s,
                F.lit("</title></head></html>")))
            .when(i % 4 == 2, F.concat(
                F.lit('<html><head><meta http-equiv="Content-Type" '
                      'content="text/html; charset=Windows-1252">'
                      "<title>t"), s, F.lit("</title></head></html>")))
            .otherwise(F.concat(F.lit("<html><head><title>t"), s,
                                F.lit("</title></head></html>"))))
    pages = d.select(
        F.concat(F.lit("https://c.org/p/"), s).alias("url"),
        html.alias("html"))
    return pages.select(
        "url", charset_of(F.col("html")).alias("charset"))


def q61_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the materialized KG
    (operators/graph.py::triangle_count — degree-ordered edge
    orientation, the O(m^1.5) distributed-scale algorithm; a naive
    wedge join is sum(deg^2) and dies on the first celebrity node).
    The oracle restates the identical orientation — (degree, id) total
    order, wedge b<c dedup, closing join — so the integer counts are
    value-exact cross-engine."""
    from quickner_spark.operators.graph import triangle_count

    return triangle_count(q28_kg_edges(spark, sf_dir))


def q62_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-host discovery by co-citation (operators/graph.py::
    cocitation — Dean & Henzinger's measure): destination hosts linked
    by many of the same PAGES are similar. Edges are page-url -> linked
    host over the q45 synthetic anchor pages; output is (a, b, shared,
    in_a, in_b) as exact integers — Jaccard = shared/(in_a+in_b-shared)
    derives at the consumer, keeping the oracle float-free. min_shared
    bounds the output; the max_fanout directory-page guard is the
    pytest-covered scale path (it cannot bind on this corpus, where
    every page links exactly 3 hosts)."""
    from quickner_spark.kg.weblinks import (extract_links, host_of,
                                            resolve_href)
    from quickner_spark.operators.graph import cocitation

    e = (extract_links(_synth_link_pages(spark, sf_dir))
         .select(F.col("url").alias("src"),
                 host_of(resolve_href(F.col("url"), F.col("href")))
                 .alias("dst"))
         .where(F.col("dst") != ""))
    return cocitation(e, min_shared=2)


def q63_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities over the materialized
    KG (operators/graph.py::label_propagation, 2 iterations). The
    deterministic variant — simultaneous updates, (count DESC, label
    ASC) argmax — is a pure function of (graph, iters), so the oracle
    unrolls the two voting rounds as plain CTEs and the labeling is
    value-exact cross-engine (the same portability property as integer
    pagerank q42 / HITS q51)."""
    from quickner_spark.operators.graph import label_propagation

    return label_propagation(q28_kg_edges(spark, sf_dir), iters=2)


def q64_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the WEIGHTED host-level webgraph — rank mass splits
    over a host's out-links proportionally to anchor count (q45's
    n_links), the form webgraph rankings actually use. 2 fixed
    iterations in integer arithmetic: contributions evaluate
    ``((rank·85) div 100)·w div W`` with the multiply-before-divide
    order restated verbatim in the oracle, so the int64 ranks are
    bit-identical cross-engine (the q42 trick extended to weighted
    mass-splitting). Self-loops dropped by filtering the memoized
    keep_self q45 graph (identical: the filter is on the group keys).
    Production default is double + weight."""
    from quickner_spark.operators.graph import pagerank

    hg = q45_host_graph(spark, sf_dir).where(
        F.col("src_host") != F.col("dst_host"))
    return pagerank(hg, src="src_host", dst="dst_host", weight="n_links",
                    iters=2, arithmetic="integer")


def q65_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the q40 seed canonicals over the
    materialized KG — the standard entity-relatedness query: teleport
    mass lands only on the seeds, so ranks measure proximity TO the
    seed set and unreachable nodes are exactly 0. Integer arithmetic
    (2 iterations); the oracle restates the seeded base/init terms as a
    CASE over the seed literals inside the q42 unrolled-iteration
    shape."""
    from quickner_spark.operators.graph import pagerank

    return pagerank(q28_kg_edges(spark, sf_dir), iters=2,
                    arithmetic="integer", seeds=list(KHOP_SEEDS))


def q66_robots_wildcards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.2.3 wildcard rule paths (kg/robots.py): one
    5-rule ``*`` group per host carrying every special-character
    shape — an anchored wildcard (``/*.php$``), a mid-rule wildcard
    spanning empty and multi-octet sequences (``/cgi*bin/``), a
    wildcard whose raw-octet length beats a shorter plain rule
    (``Allow: /p/pub*`` vs ``Disallow: /p/``), and a mid-path literal
    ``$`` (``/a$b``) — decided over a 7-variant frontier (including a
    query string that defeats the ``$`` anchor and a rule-less path).
    The oracle restates the Column-built regex compilation (metachar
    escape, ``*`` → ``.*``, re-anchor) and the wild-vs-prefix match
    dispatch in DuckDB; the rules table is restated literally (the
    bodies are parse-trivial constants — parsing itself is pinned by
    q52/q57/q58)."""
    from quickner_spark.kg.robots import frontier_allowed, robots_rules

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 10).cast("string")
    host = F.concat(F.lit("w"), k, F.lit(".example.com"))
    body = F.lit("User-agent: *\nDisallow: /*.php$\nDisallow: /cgi*bin/\n"
                 "Allow: /p/pub*\nDisallow: /p/\nDisallow: /a$b\n")
    robots = d.select(host.alias("host"), body.alias("body")).distinct()
    v, s = i % 7, i.cast("string")
    path = (F.when(v == 0, F.concat(F.lit("/p/pub"), s))
            .when(v == 1, F.concat(F.lit("/p/x/"), s))
            .when(v == 2, F.concat(F.lit("/index"), s, F.lit(".php")))
            .when(v == 3, F.concat(F.lit("/index"), s, F.lit(".php?q=1")))
            .when(v == 4, F.when(i % 2 == 0,
                                 F.concat(F.lit("/cgibin/"), s))
                           .otherwise(F.concat(F.lit("/cgi-"), s,
                                               F.lit("-bin/x"))))
            .when(v == 5, F.concat(F.lit("/a$b/"), s))
            .otherwise(F.concat(F.lit("/free/"), s)))
    urls = d.select(F.concat(F.lit("https://"), host, path).alias("url"))
    return frontier_allowed(urls, robots_rules(robots))


def q67_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image pipeline over REAL media bytes
    (operators/multimodal.py): each document row synthesizes a genuine
    binary PPM (P6, 4x4, maxval 255) whose 48 raster bytes derive
    deterministically from doc_id ((id*31 + j*7) mod 256); every 7th id
    truncates the raster (recognized-but-corrupt -> decode None, the
    error path). image_features decodes via the pure-stdlib AUTO codec
    and emits a 16-bin normalized histogram, posexploded to scalar rows.
    The oracle restates decode+histogram arithmetically: bin = byte div
    16 (np.histogram over range (0,256) with 16 bins), feature =
    count/48.0 double-rounded to REAL — bit-identical to Spark's
    float32, since both engines round the same exact double."""
    import pandas as pd  # noqa: PLC0415

    from quickner_spark.operators.multimodal import (decode_image_auto,
                                                     image_features)

    d = _docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"].values:
                i = int(i)
                n = 10 if i % 7 == 0 else 48
                raster = bytes((i * 31 + j * 7) % 256 for j in range(n))
                ids.append(i)
                blobs.append(b"P6\n4 4\n255\n" + raster)
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "data": pd.Series(blobs, dtype=object)})

    media = d.mapInPandas(synth, "media_id long, data binary")
    feats = image_features(media, decoder=decode_image_auto)
    return feats.select(
        "media_id", "ok",
        F.posexplode("feature").alias("bin", "feature")
    ).select("media_id", "ok", F.col("bin").cast("int").alias("bin"),
             "feature")


def q68_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio pipeline over REAL PCM WAV bytes
    (operators/multimodal.py): each document row synthesizes a genuine
    mono 16-bit WAV (stdlib ``wave`` writer, 64 samples) whose sample
    values are m*256 with m = ((id*13 + j*29) mod 256) - 128 — chosen so
    every decoded float32 (m/128), product, and windowed mean is EXACT
    in binary32, leaving sqrt as the only rounding step on either
    engine (correctly-rounded f64 sqrt then f32 cast == f32 sqrt, the
    innocuous-double-rounding bound 53 >= 2*24+2). Every 7th id emits
    an empty payload (decode None -> ok false, zero features).
    audio_features decodes via the stdlib AUTO codec and emits 8-window
    RMS (posexploded) + the zero-crossing count; the oracle restates
    the window mean, sqrt, and sign-change lag scan in SQL."""
    import pandas as pd  # noqa: PLC0415

    from quickner_spark.operators.multimodal import (audio_features,
                                                     decode_audio_auto)

    d = _docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        import io
        import wave as wave_mod

        import numpy as np
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"].values:
                i = int(i)
                ids.append(i)
                if i % 7 == 0:
                    blobs.append(b"")
                    continue
                m = np.array([(i * 13 + j * 29) % 256 - 128
                              for j in range(64)], dtype=np.int32) * 256
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(m.astype("<i2").tobytes())
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "data": pd.Series(blobs, dtype=object)})

    media = d.mapInPandas(synth, "media_id long, data binary")
    feats = audio_features(media, n_windows=8, decoder=decode_audio_auto)
    return feats.select(
        "media_id", "ok", F.posexplode("rms").alias("win", "rms"),
        "zero_crossings"
    ).select("media_id", "ok", F.col("win").cast("int").alias("win"),
             "rms", "zero_crossings")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full mention extraction."""
    return q01_mentions(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Production-configuration twins. Five queries run in the PORTABLE (md5)
# hash family above solely so the DuckDB oracle can reproduce them
# bit-for-bit; production deployments run xxhash64 (JVM intrinsic) and, for
# IVF, float64 centroids. bench.py measures THESE, so the benchmark tracks
# what production executes instead of silently absorbing the md5 tax the
# round-3 bench did (q15 +166%, q14 +57%); the correctness gate keeps
# verifying the portable twins in queries().
# ---------------------------------------------------------------------------

def q14_minhash_dedup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.minhash_dedup(_docs(spark, sf_dir), n=3, num_hashes=64,
                            bands=16, threshold_pct=80)


def q15_simhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.simhash64(_docs(spark, sf_dir))


def q16_lsh_knn_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ss.lsh_topk(_emb(spark, sf_dir), k=5, probe_ids=KNN_PROBES,
                      n_planes=4, n_tables=16)
    return out.select("probe_id", "neighbor_id",
                      F.col("rank").cast("long").alias("rank"), "cosine")


def q24_ivf_knn_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ss.ivf_topk(_emb(spark, sf_dir), k=5, probe_ids=KNN_PROBES,
                      nlist=16, nprobe=4, iters=2)
    return out.select("probe_id", "neighbor_id",
                      F.col("rank").cast("long").alias("rank"), "cosine")


def q31_lsh_dup_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.lsh_dup_pairs(_emb(spark, sf_dir), threshold_pct=40,
                            n_planes=4, n_tables=16)


def production_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Overrides for bench.py: same query names, production hash family.
    Every other queries() entry already runs its production configuration."""
    return {
        "q14_minhash_dedup": q14_minhash_dedup_prod,
        "q15_simhash": q15_simhash_prod,
        "q16_lsh_knn": q16_lsh_knn_prod,
        "q24_ivf_knn": q24_ivf_knn_prod,
        "q31_lsh_dup_pairs": q31_lsh_dup_pairs_prod,
        "q56_cdx_index": q56_cdx_index_prod,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_mentions": q01_mentions,
        "q02_label_histogram": q02_label_histogram,
        "q03_docs_by_label": q03_docs_by_label,
        "q04_docs_by_entity": q04_docs_by_entity,
        "q05_entity_index": q05_entity_index,
        "q06_filter_valid": q06_filter_valid,
        "q07_exact_dedup": q07_exact_dedup,
        "q08_token_stats": q08_token_stats,
        "q09_corpus_stats": q09_corpus_stats,
        "q10_ngram_jaccard_pairs": q10_ngram_jaccard_pairs,
        "q11_knn_quantized_ip": q11_knn_quantized_ip,
        "q12_triples": q12_triples,
        "q13_components": q13_components,
        "q14_minhash_dedup": q14_minhash_dedup,
        "q15_simhash": q15_simhash,
        "q16_lsh_knn": q16_lsh_knn,
        "q17_lang_id": q17_lang_id,
        "q18_embedding_dups": q18_embedding_dups,
        "q19_salted_entity_index": q19_salted_entity_index,
        "q20_event_windows": q20_event_windows,
        "q21_sessions": q21_sessions,
        "q22_quality_score": q22_quality_score,
        "q23_fingerprint": q23_fingerprint,
        "q24_ivf_knn": q24_ivf_knn,
        "q25_repeated_blocks": q25_repeated_blocks,
        "q26_json_props": q26_json_props,
        "q27_link_scores": q27_link_scores,
        "q28_kg_edges": q28_kg_edges,
        "q29_maximal_mentions": q29_maximal_mentions,
        "q30_inferred_gazetteer": q30_inferred_gazetteer,
        "q31_lsh_dup_pairs": q31_lsh_dup_pairs,
        "q32_conll_export": q32_conll_export,
        "q33_brat_export": q33_brat_export,
        "q34_dup_clusters": q34_dup_clusters,
        "q35_window_triples": q35_window_triples,
        "q36_jsonl_export": q36_jsonl_export,
        "q37_spacy_export": q37_spacy_export,
        "q38_latest_events": q38_latest_events,
        "q39_snapshot_delta": q39_snapshot_delta,
        "q40_khop": q40_khop,
        "q41_degrees": q41_degrees,
        "q42_pagerank": q42_pagerank,
        "q43_ntriples_export": q43_ntriples_export,
        "q44_pattern_match": q44_pattern_match,
        "q45_host_graph": q45_host_graph,
        "q46_anchor_dictionary": q46_anchor_dictionary,
        "q47_anchor_aliases": q47_anchor_aliases,
        "q48_domain_graph": q48_domain_graph,
        "q49_url_normalize": q49_url_normalize,
        "q50_page_meta": q50_page_meta,
        "q51_hits": q51_hits,
        "q52_robots_frontier": q52_robots_frontier,
        "q53_cooccurrence": q53_cooccurrence,
        "q54_wet_export": q54_wet_export,
        "q55_sitemap_urls": q55_sitemap_urls,
        "q56_cdx_index": q56_cdx_index,
        "q57_frontier_plan": q57_frontier_plan,
        "q58_robots_sitemaps": q58_robots_sitemaps,
        "q59_wat_export": q59_wat_export,
        "q60_charset": q60_charset,
        "q61_triangles": q61_triangles,
        "q62_cocitation": q62_cocitation,
        "q63_communities": q63_communities,
        "q64_weighted_pagerank": q64_weighted_pagerank,
        "q65_personalized_pagerank": q65_personalized_pagerank,
        "q66_robots_wildcards": q66_robots_wildcards,
        "q67_image_features": q67_image_features,
        "q68_audio_features": q68_audio_features,
    }


def _alias_values_sql() -> str:
    rows = []
    for name, label in normalize_gazetteer(GAZETTEER):
        canonical = name.replace(" ", "_")
        rows.append(f"('{name}', '{canonical}', '{label}', 100)")
        for al in EXTRA_ALIASES.get(name, ()):
            rows.append(f"('{al.lower()}', '{canonical}', '{label}', 10)")
    return ("al(alias, canonical_id, label, prior) AS (VALUES "
            + ", ".join(rows) + ")")


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB twins
# ---------------------------------------------------------------------------

def _lsh_sig_cte(n_planes: int, n_tables: int, seed: int) -> str:
    """DuckDB twin of simsearch._lsh_signatures in PORTABLE mode: md5-low-60
    plane signs over integer-quantized (scale 1000) components; the sign
    test is exact integer arithmetic, so signatures match Spark's
    bit-for-bit. Yields CTEs ``v`` (quantized vectors) and ``sig``
    (vec_id, tbl, sig)."""
    return f"""
v AS (SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
      FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
dims AS (SELECT len(embedding) AS dim FROM embeddings
         WHERE embedding IS NOT NULL LIMIT 1),
planes AS (
  SELECT t.i // ({n_planes} * dim) AS tbl,
         (t.i // dim) % {n_planes} AS plane,
         t.i % dim AS d,
         CASE WHEN ('0x' || substr(md5('lsh:{seed}:' || t.i), 1, 15))::BIGINT & 1 = 0
              THEN 1::BIGINT ELSE -1::BIGINT END AS w
  FROM dims, LATERAL (SELECT unnest(range({n_tables} * {n_planes} * dim)) AS i) t
),
vex AS (SELECT vec_id, t.i AS d, q[t.i + 1] AS x
        FROM v, LATERAL (SELECT unnest(range(len(q))) AS i) t),
proj AS (SELECT vec_id, tbl, plane, sum(x * w) AS s
         FROM vex JOIN planes USING (d) GROUP BY 1, 2, 3),
sig AS (SELECT vec_id, tbl,
               CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << plane)
                             ELSE 0 END) AS BIGINT) AS sig
        FROM proj GROUP BY 1, 2)"""


def _ivf_cte(nlist: int, nprobe: int, iters: int, k: int,
             probe_list: str, seed: int = 42, res: int = 256) -> str:
    """DuckDB twin of simsearch._ivf_topk_portable: md5 seeding, integer
    centroids via floor((Σx·res)/n) — exact int64 sums, one IEEE division
    per component — integer assignment/probing distances, quantized-cosine
    scoring. Lloyd iterations are UNROLLED (c0 → a0 → c1 → a1 → c2), so
    the whole quantizer is plain CTEs, no recursion."""
    parts = [f"""
v AS (SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
      FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
vexp AS (SELECT vec_id, t.i AS d, q[t.i + 1] AS x
         FROM v, LATERAL (SELECT unnest(range(len(q))) AS i) t),
hs AS (SELECT vec_id,
              ('0x' || substr(md5('ivf:{seed}:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
       FROM v),
seeds AS (SELECT vec_id, rn - 1 AS cid FROM (
            SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) AS rn FROM hs)
          WHERE rn <= {nlist}),
c0 AS (SELECT s.cid, e.d, e.x * {res} AS c
       FROM seeds s JOIN vexp e USING (vec_id))"""]
    for it in range(iters):
        parts.append(f"""
d{it} AS (SELECT e.vec_id, c.cid,
          CAST(sum(({res}*e.x - c.c)*({res}*e.x - c.c)) AS BIGINT) AS dist2
          FROM vexp e JOIN c{it} c USING (d) GROUP BY 1, 2),
a{it} AS (SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist2, cid) AS rn
            FROM d{it}) WHERE rn = 1),
c{it + 1} AS (SELECT a.cid, e.d,
              CAST(floor(CAST(sum(e.x) * {res} AS DOUBLE)
                         / CAST(count(*) AS DOUBLE)) AS BIGINT) AS c
              FROM a{it} a JOIN vexp e USING (vec_id) GROUP BY 1, 2)""")
    parts.append(f"""
dfin AS (SELECT e.vec_id, c.cid,
         CAST(sum(({res}*e.x - c.c)*({res}*e.x - c.c)) AS BIGINT) AS dist2
         FROM vexp e JOIN c{iters} c USING (d) GROUP BY 1, 2),
afin AS (SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist2, cid) AS rn
           FROM dfin) WHERE rn = 1),
pcells AS (SELECT vec_id AS probe_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY dist2, cid) AS rn
             FROM dfin WHERE vec_id IN ({probe_list}))
           WHERE rn <= {nprobe}),
ivf_cand AS (SELECT p.probe_id, a.vec_id AS neighbor_id
             FROM pcells p JOIN afin a USING (cid)
             WHERE a.vec_id <> p.probe_id),
ivf_nrm AS (SELECT vec_id, q,
                   CAST(list_sum(list_transform(range(1, len(q) + 1),
                                                i -> q[i] * q[i])) AS BIGINT) AS n2
            FROM v),
ivf_scored AS (
  SELECT probe_id, neighbor_id,
         CAST(CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                           i -> a.q[i] * b.q[i])) AS BIGINT) AS DOUBLE)
           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
  FROM ivf_cand
  JOIN ivf_nrm a ON a.vec_id = probe_id
  JOIN ivf_nrm b ON b.vec_id = neighbor_id)""")
    return ",".join(parts)


def oracle_sql() -> dict[str, str]:
    cte = _mentions_cte()
    filt = VALID_FILTERS.duckdb_predicate("text")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    pred_values = ", ".join(f"('{p}')" for p in PREDICATES)
    win = max(len(p) for p in PREDICATES) + 2
    probe_list = ", ".join(str(p) for p in KNN_PROBES)
    mh_a, mh_b = minhash_mix_constants(64)
    mh_a_lit = "[" + ", ".join(str(x) for x in mh_a) + "]"
    mh_b_lit = "[" + ", ".join(str(x) for x in mh_b) + "]"
    lsh_cte = _lsh_sig_cte(n_planes=4, n_tables=16, seed=42)
    ivf_cte = _ivf_cte(nlist=16, nprobe=4, iters=2, k=5,
                       probe_list=probe_list)
    # shared CTE chain ending in e(src, dst, pred, weight) — the q28 edge
    # materialization, reused by the graph-query oracles q40-q42
    edges_chain = f"""{cte},
preds(pred) AS (VALUES {pred_values}),
{_alias_values_sql()},
t AS (
  SELECT m1.doc_id, m1.surface AS subj, p.pred, m2.surface AS obj
  FROM mentions m1
  JOIN mentions m2 ON m1.doc_id = m2.doc_id
  CROSS JOIN preds p
  JOIN d ON d.doc_id = m1.doc_id
  WHERE m2."start" = m1."end" + 2 + length(p.pred)
    AND substring(d.text, CAST(m1."end" AS INT) + 2, length(p.pred)) = p.pred
    AND substring(d.text, CAST(m1."end" AS INT) + 1, 1) = ' '
    AND substring(d.text, CAST(m1."end" + length(p.pred) AS INT) + 2, 1) = ' '
),
amap AS (
  SELECT alias, arg_max(canonical_id, prior) AS cid FROM al GROUP BY alias
),
e AS (
  SELECT sm.cid AS src, om.cid AS dst, t.pred, count(*) AS weight
  FROM t
  JOIN amap sm ON t.subj = sm.alias
  JOIN amap om ON t.obj = om.alias
  GROUP BY 1, 2, 3
)"""
    seeds_values = ", ".join(f"('{s}')" for s in KHOP_SEEDS)

    def _nt_sql(expr: str) -> str:
        # the same percent-encoding chain as sinks.formats._nt_iri,
        # '%' first so already-encoded ids cannot double-decode
        for raw, enc in [("%", "%25"), (" ", "%20"), ("<", "%3C"),
                         (">", "%3E"), ('"', "%22"), ("{", "%7B"),
                         ("}", "%7D"), ("|", "%7C"), ("^", "%5E"),
                         ("`", "%60"), ("\\", "%5C")]:
            expr = f"replace({expr}, '{raw}', '{enc}')"
        return expr
    # q42: 3 integer-PageRank iterations unrolled (scale 10^9, damping
    # 85/100 — base term (10^9*15)//100; integer division matches the
    # engine's `div` exactly on non-negative ranks)
    pr_chain = []
    for i in range(3):
        pr_chain.append(f"""
c{i + 1} AS (SELECT e2.dst AS node,
            CAST(sum((r."rank" * 85) // (100 * deg.d)) AS BIGINT) AS s
        FROM e2 JOIN r{i} r ON r.node = e2.src
        JOIN deg ON deg.src = e2.src GROUP BY 1),
r{i + 1} AS (SELECT n.node, 150000000 + coalesce(c{i + 1}.s, 0) AS "rank"
        FROM nodes n LEFT JOIN c{i + 1} ON c{i + 1}.node = n.node)""")
    pr_iters = ",".join(pr_chain)
    # q64: 2 WEIGHTED integer-PageRank iterations over the host graph —
    # rank mass splits proportionally to anchor count; the contribution
    # restates the engine's exact multiply-before-divide order
    # ((rank*85) div 100) * w div W on non-negative int64s
    wpr_chain = []
    for i in range(2):
        wpr_chain.append(f"""
wc{i + 1} AS (SELECT we.dst AS node,
            CAST(sum(((wr{i}."rank" * 85) // 100) * we.w // wdeg.d)
                 AS BIGINT) AS s
        FROM we JOIN wr{i} ON wr{i}.node = we.src
        JOIN wdeg ON wdeg.src = we.src GROUP BY 1),
wr{i + 1} AS (SELECT n.node, 150000000 + coalesce(wc{i + 1}.s, 0) AS "rank"
        FROM wnodes n LEFT JOIN wc{i + 1} ON wc{i + 1}.node = n.node)""")
    wpr_iters = ",".join(wpr_chain)
    # q65: personalized integer PageRank — the q42 unrolled shape with
    # the base/init terms gated on seed membership (teleport mass lands
    # only on the seeds; unreachable nodes stay exactly 0)
    seed_in = "node IN (" + ", ".join(f"'{s}'" for s in KHOP_SEEDS) + ")"
    ppr_chain = []
    for i in range(2):
        ppr_chain.append(f"""
pc{i + 1} AS (SELECT e2.dst AS node,
            CAST(sum((pr{i}."rank" * 85) // (100 * deg.d)) AS BIGINT) AS s
        FROM e2 JOIN pr{i} ON pr{i}.node = e2.src
        JOIN deg ON deg.src = e2.src GROUP BY 1),
pr{i + 1} AS (SELECT n.node,
            (CASE WHEN n.{seed_in} THEN 150000000
                  ELSE 0 END) + coalesce(pc{i + 1}.s, 0) AS "rank"
        FROM nodes n LEFT JOIN pc{i + 1} ON pc{i + 1}.node = n.node)""")
    ppr_iters = ",".join(ppr_chain)
    # q51: 2 integer-HITS iterations unrolled over the host graph
    # (scale 10^9; L1 normalization = `score // greatest(1, total //
    # scale)` — the same overflow-safe two-step division the engine
    # runs, so int64 sums make each step bit-exact cross-engine)
    hits_chain = []
    for i in range(2):
        hits_chain.append(f"""
ar{i + 1} AS (SELECT e3.dst AS node, CAST(sum(h{i}.h) AS BIGINT) AS s
        FROM e3 JOIN h{i} ON h{i}.node = e3.src GROUP BY 1),
a{i + 1} AS (SELECT n.node, coalesce(ar{i + 1}.s // greatest(1,
            CAST((SELECT sum(s) FROM ar{i + 1}) AS BIGINT)
            // 1000000000), 0) AS a
        FROM hnodes n LEFT JOIN ar{i + 1} ON ar{i + 1}.node = n.node),
hr{i + 1} AS (SELECT e3.src AS node, CAST(sum(a{i + 1}.a) AS BIGINT) AS s
        FROM e3 JOIN a{i + 1} ON a{i + 1}.node = e3.dst GROUP BY 1),
h{i + 1} AS (SELECT n.node, coalesce(hr{i + 1}.s // greatest(1,
            CAST((SELECT sum(s) FROM hr{i + 1}) AS BIGINT)
            // 1000000000), 0) AS h
        FROM hnodes n LEFT JOIN hr{i + 1} ON hr{i + 1}.node = n.node)""")
    hits_iters = ",".join(hits_chain)
    return {
        "q24_ivf_knn": f"""
WITH {ivf_cte}
SELECT probe_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM ivf_scored
) WHERE rank <= 5
""",
        "q01_mentions": f"""
WITH {cte}
SELECT doc_id, "start", "end", label, surface FROM mentions
""",
        "q02_label_histogram": f"""
WITH {cte}
SELECT label, count(*) AS n_mentions FROM mentions GROUP BY label
""",
        "q03_docs_by_label": f"""
WITH {cte}
SELECT DISTINCT doc_id FROM mentions WHERE label = 'OP'
""",
        "q04_docs_by_entity": f"""
WITH {cte}
SELECT DISTINCT doc_id FROM mentions WHERE lower(surface) = 'spark'
""",
        "q05_entity_index": f"""
WITH {cte}
SELECT lower(surface) AS surface, count(DISTINCT doc_id) AS n_docs
FROM mentions GROUP BY 1
""",
        "q06_filter_valid": f"""
SELECT doc_id FROM documents WHERE {filt}
""",
        "q07_exact_dedup": """
WITH u AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
FROM u GROUP BY text HAVING count(*) > 1
""",
        "q08_token_stats": f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_filter(string_split(text, ' '), x -> x IN ({stop_list}))) AS BIGINT) AS n_stopwords,
       CAST(length(text) AS BIGINT) AS n_chars_text
FROM documents
""",
        "q09_corpus_stats": """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang
""",
        "q10_ngram_jaccard_pairs": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS shingle
  FROM w, LATERAL (SELECT unnest(range(0, len(ws) - 2)) AS i) t
),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared, ca.n_sh AS n_a, cb.n_sh AS n_b
FROM pairs
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE 100 * shared >= 80 * (ca.n_sh + cb.n_sh - shared)
""",
        "q11_knn_quantized_ip": f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0
),
p AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id IN ({probe_list})),
scored AS (
  SELECT p.probe_id, q.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                      i -> p.pq[i] * q.qv[i])) AS BIGINT) AS score
  FROM p, q WHERE q.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, rank, score FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "q12_triples": f"""
WITH {cte},
preds(pred) AS (VALUES {pred_values})
SELECT m1.doc_id,
       m1.surface AS subj, p.pred, m2.surface AS obj,
       m1."start" AS subj_start, m2."start" AS obj_start
FROM mentions m1
JOIN mentions m2 ON m1.doc_id = m2.doc_id
CROSS JOIN preds p
JOIN d ON d.doc_id = m1.doc_id
WHERE m2."start" = m1."end" + 2 + length(p.pred)
  AND substring(d.text, CAST(m1."end" AS INT) + 2, length(p.pred)) = p.pred
  AND substring(d.text, CAST(m1."end" AS INT) + 1, 1) = ' '
  AND substring(d.text, CAST(m1."end" + length(p.pred) AS INT) + 2, 1) = ' '
""",
        "q13_components": f"""
WITH RECURSIVE {cte},
e AS (
  SELECT DISTINCT m1.surface AS u, m2.surface AS v
  FROM mentions m1
  JOIN mentions m2 ON m1.doc_id = m2.doc_id
   AND m2."start" = m1."end" + 1 AND m1.surface <> m2.surface
),
sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
nodes AS (SELECT DISTINCT u AS node FROM sym),
reach(node, anc) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.v, r.anc FROM reach r JOIN sym s ON r.node = s.u
)
SELECT node, min(anc) AS component FROM reach GROUP BY node
""",
        "q17_lang_id": _langid_sql(),
        "q20_event_windows": """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(floor(sum(value)) AS BIGINT) AS sum_value_fl
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
""",
        "q21_sessions": """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE ts IS NOT NULL
),
s AS (
  SELECT user_id,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM g
),
per AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
SELECT user_id, max(session_id) AS n_sessions,
       max(n) AS max_session_events
FROM per GROUP BY user_id
""",
        "q22_quality_score": f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ({stop_list}))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
),
p AS (
  SELECT doc_id, n_chars, n_tok,
         CASE WHEN n_tok > 0 THEN CAST(floor(100.0 * n_stop / n_tok) AS BIGINT) ELSE 0 END AS stop_pct,
         CASE WHEN n_tok > 0 THEN CAST(floor(100.0 * n_distinct / n_tok) AS BIGINT) ELSE 0 END AS distinct_pct,
         CASE WHEN n_chars > 0 THEN CAST(floor(100.0 * n_punct / n_chars) AS BIGINT) ELSE 0 END AS punct_pct,
         CASE WHEN n_chars >= 50 AND n_chars <= 100000 THEN 1 ELSE 0 END AS length_ok
  FROM t
)
SELECT doc_id, n_chars AS n_chars_text, n_tok AS n_tokens,
       stop_pct, distinct_pct, punct_pct,
       least(stop_pct * 2, 30) + least(CAST(floor(distinct_pct / 2.0) AS BIGINT), 40)
       + greatest(20 - punct_pct, 0) + length_ok * 10 AS quality
FROM p
""",
        "q18_embedding_dups": """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0
),
n AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                      i -> qv[i] * qv[i])) AS BIGINT) AS n2
  FROM q
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                                      i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
         a.n2 AS n2_a, b.n2 AS n2_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot, n2_a, n2_b
FROM p WHERE dot > 0 AND dot * dot * 10000 >= 1600 * n2_a * n2_b
""",
        # PORTABLE-hash twins (md5-derived family, hashing.py): the full
        # signature -> bucket -> candidate -> verify chain restated
        # relationally, bit-identical to the Spark portable mode.
        "q14_minhash_dedup": f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
shs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(ws) - 2),
                       i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS sh_set
  FROM w
),
hx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
       FROM shs, unnest(sh_set) AS t(s)),
consts AS (SELECT {mh_a_lit} AS a, {mh_b_lit} AS b),
sigel AS (
  SELECT doc_id, r.i AS i,
         min((a[r.i + 1]::BIGINT * (h % {MIX_M}) + b[r.i + 1]::BIGINT) % {MIX_P}) AS hv
  FROM hx, range(64) r(i), consts GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(hv ORDER BY i) AS sig FROM sigel GROUP BY doc_id),
banded AS (
  SELECT doc_id, r.i AS band,
         md5(array_to_string(sig[r.i * 4 + 1 : r.i * 4 + 4], ',') || '|' || r.i) AS bucket
  FROM sig, range(16) r(i)
),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
ver AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS BIGINT) AS shared,
         CAST(len(sa.sh_set) AS BIGINT) AS n_a,
         CAST(len(sb.sh_set) AS BIGINT) AS n_b
  FROM cand JOIN shs sa ON sa.doc_id = doc_a JOIN shs sb ON sb.doc_id = doc_b
)
SELECT * FROM ver WHERE 100 * shared >= 80 * (n_a + n_b - shared)
""",
        "q15_simhash": """
WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h1,
                 ('0x' || substr(md5(t), 17, 15))::BIGINT AS h2
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
),
bits AS (
  SELECT doc_id, r.i AS b,
         sum(CASE WHEN (CASE WHEN r.i < 60 THEN h1 >> r.i
                             ELSE h2 >> (r.i - 60) END) & 1 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM tok, range(64) r(i) GROUP BY 1, 2
)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN
         CASE WHEN b = 63 THEN -9223372036854775808
              ELSE (1::BIGINT << b) END
       ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""",
        "q16_lsh_knn": f"""
WITH {lsh_cte},
nrm AS (SELECT vec_id, q,
               CAST(list_sum(list_transform(range(1, len(q) + 1),
                                            i -> q[i] * q[i])) AS BIGINT) AS n2
        FROM v),
cand AS (
  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
  FROM sig p JOIN sig c
    ON p.tbl = c.tbl AND p.sig = c.sig AND p.vec_id <> c.vec_id
  WHERE p.vec_id IN ({probe_list})
),
scored AS (
  SELECT probe_id, neighbor_id,
         CAST(CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                           i -> a.q[i] * b.q[i])) AS BIGINT) AS DOUBLE)
           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
  FROM cand JOIN nrm a ON a.vec_id = probe_id JOIN nrm b ON b.vec_id = neighbor_id
)
SELECT probe_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "q31_lsh_dup_pairs": f"""
WITH {lsh_cte},
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sig a JOIN sig b
           ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id),
q100 AS (SELECT vec_id,
                list_transform(embedding,
                               x -> CAST(round(CAST(x AS DOUBLE)*100) AS BIGINT)) AS q
         FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
nrm AS (SELECT vec_id, q,
               CAST(list_sum(list_transform(range(1, len(q) + 1),
                                            i -> q[i] * q[i])) AS BIGINT) AS n2
        FROM q100),
pr AS (SELECT id_a, id_b,
              CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                           i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
              a.n2 AS n2_a, b.n2 AS n2_b
       FROM cand JOIN nrm a ON a.vec_id = id_a JOIN nrm b ON b.vec_id = id_b)
SELECT id_a, id_b, dot, n2_a, n2_b
FROM pr WHERE dot > 0 AND dot * dot * 10000 >= 1600 * n2_a * n2_b
""",
        "q19_salted_entity_index": f"""
WITH {cte}
SELECT lower(surface) AS surface, count(DISTINCT doc_id) AS n_docs
FROM mentions GROUP BY 1
""",
        "q23_fingerprint": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
  array_to_string(list_sort(list_distinct([
     list_min(list_transform(toks[(i*8+1):(i*8+8)], t -> md5(t)))
     FOR i IN range(0, CAST(floor((len(toks)-1)/8) AS INT) + 1)
  ])), ',') AS fingerprint
FROM t
""",
        "q25_repeated_blocks": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(toks[(i*16+1):(i*16+16)], ' ')) AS block_md5
  FROM t, LATERAL (SELECT unnest(range(0, CAST(floor(len(toks)/16) AS INT))) AS i) x
  WHERE len(toks) >= 16
)
SELECT block_md5, count(*) AS n_docs, min(doc_id) AS first_doc
FROM b GROUP BY 1 HAVING count(*) >= 2
""",
        "q26_json_props": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
        "q27_link_scores": f"""
WITH {cte},
{_alias_values_sql()},
dt AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
c AS (
  SELECT m.doc_id, m."start", m."end", m.surface, a.canonical_id, a.label,
         ln(1 + a.prior)
         + len(list_distinct(list_intersect(
             dt.toks, string_split(replace(a.canonical_id, '_', ' '), ' ')))) AS score
  FROM mentions m
  JOIN al a ON lower(m.surface) = a.alias
  JOIN dt ON dt.doc_id = m.doc_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, "start", "end", surface
                               ORDER BY score DESC, canonical_id DESC) AS rn
  FROM c
)
SELECT doc_id, "start", "end", surface, canonical_id, label,
       CAST(round(score * 1000) AS BIGINT) AS score_milli
FROM r WHERE rn = 1
""",
        "q28_kg_edges": f"""
WITH {cte},
preds(pred) AS (VALUES {pred_values}),
{_alias_values_sql()},
t AS (
  SELECT m1.doc_id, m1.surface AS subj, p.pred, m2.surface AS obj
  FROM mentions m1
  JOIN mentions m2 ON m1.doc_id = m2.doc_id
  CROSS JOIN preds p
  JOIN d ON d.doc_id = m1.doc_id
  WHERE m2."start" = m1."end" + 2 + length(p.pred)
    AND substring(d.text, CAST(m1."end" AS INT) + 2, length(p.pred)) = p.pred
    AND substring(d.text, CAST(m1."end" AS INT) + 1, 1) = ' '
    AND substring(d.text, CAST(m1."end" + length(p.pred) AS INT) + 2, 1) = ' '
),
amap AS (
  -- max prior is unique per alias in this table, so arg_max matches the
  -- engine's max_by(canonical_id, struct(prior, canonical_id))
  SELECT alias, arg_max(canonical_id, prior) AS cid FROM al GROUP BY alias
)
SELECT sm.cid AS src, om.cid AS dst, t.pred, count(*) AS weight
FROM t
JOIN amap sm ON t.subj = sm.alias
JOIN amap om ON t.obj = om.alias
GROUP BY 1, 2, 3
""",
        "q29_maximal_mentions": f"""
WITH {cte}
SELECT m.doc_id, m."start", m."end", m.label, m.surface
FROM mentions m
WHERE NOT EXISTS (
  SELECT 1 FROM mentions b
  WHERE b.doc_id = m.doc_id AND b."start" <= m."start" AND m."end" <= b."end"
    AND (b."start" <> m."start" OR b."end" <> m."end"))
""",
        "q30_inferred_gazetteer": f"""
WITH {cte}
SELECT DISTINCT surface AS name, label FROM mentions
""",
        "q32_conll_export": f"""
WITH {cte},
spans AS (
  SELECT doc_id, label, surface,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY "start", "end", label) AS ord
  FROM mentions
),
dt AS (SELECT doc_id, lower(text) AS text FROM documents),
w AS (
  SELECT dt.doc_id, t.i,
         list_extract(string_split(dt.text, ' '), t.i) AS word
  FROM dt, LATERAL (
    SELECT unnest(range(1, len(string_split(dt.text, ' ')) + 1)) AS i) t
),
hits AS (
  SELECT s.doc_id, s.ord, s.label, min(w.i) AS first_i
  FROM spans s JOIN w ON w.doc_id = s.doc_id AND contains(w.word, s.surface)
  GROUP BY 1, 2, 3
),
tags AS (
  SELECT w.doc_id, w.i, w.word,
         coalesce(arg_max(h.label, h.ord), 'O') AS tag
  FROM w LEFT JOIN hits h ON h.doc_id = w.doc_id AND h.first_i = w.i
  GROUP BY 1, 2, 3
)
SELECT doc_id,
       string_agg(word || chr(9) || tag, chr(10) ORDER BY i) || chr(10)
         AS value
FROM tags GROUP BY doc_id
""",
        "q33_brat_export": f"""
WITH {cte},
spans AS (
  SELECT doc_id, "start", "end", label, surface,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY "start", "end", label) - 1 AS i
  FROM mentions
)
SELECT doc_id,
       string_agg('T' || i || chr(9) || label || chr(9) || "start"
                  || chr(9) || "end" || chr(9) || surface,
                  chr(10) ORDER BY i) AS value
FROM spans GROUP BY doc_id
""",
        "q34_dup_clusters": """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS shingle
  FROM w, LATERAL (SELECT unnest(range(0, len(ws) - 2)) AS i) t
),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
p AS (
  SELECT doc_a, doc_b FROM cand
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE 100 * shared >= 80 * (ca.n_sh + cb.n_sh - shared)
),
sym AS (SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p),
reach(node, anc) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym) s
  UNION
  SELECT s.v, r.anc FROM reach r JOIN sym s ON r.node = s.u
),
comp AS (SELECT node, min(anc) AS component FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       coalesce(c.component, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
""",
        # q36/q37: export byte layouts restated by string concatenation —
        # the corpus is lowercase [a-z0-9 ] so no JSON escaping can occur
        # (the engine-side writers DO escape, via to_json; pinned by the
        # quote/backslash cases in tests/test_sinks.py)
        "q36_jsonl_export": f"""
WITH {cte},
spans AS (
  SELECT doc_id,
         string_agg('[' || "start" || ',' || "end" || ',"' || label || '"]',
                    ',' ORDER BY "start", "end", label) AS sp
  FROM mentions GROUP BY doc_id
),
dt AS (SELECT doc_id, lower(text) AS text FROM documents)
SELECT dt.doc_id,
       '{{"id":' || dt.doc_id || ',"text":'
         || CASE WHEN dt.text IS NULL THEN 'null'
                 ELSE '"' || dt.text || '"' END
         || ',"label":[' || coalesce(sp, '') || ']}}' AS value
FROM dt LEFT JOIN spans USING (doc_id)
""",
        "q37_spacy_export": f"""
WITH {cte},
spans AS (
  SELECT doc_id,
         string_agg('[' || "start" || ',' || "end" || ',"' || label || '"]',
                    ',' ORDER BY "start", "end", label) AS sp
  FROM mentions GROUP BY doc_id
),
dt AS (SELECT doc_id, lower(text) AS text FROM documents)
SELECT dt.doc_id,
       '[' || CASE WHEN dt.text IS NULL THEN 'null'
                   ELSE '"' || dt.text || '"' END
         || ',{{"entity":[' || coalesce(sp, '') || ']}}]' AS value
FROM dt LEFT JOIN spans USING (doc_id)
""",
        # q35: the window restatement of q12 — mentions carry their
        # post-span text window, the connective is a startswith on it,
        # and the document table never appears in the triple join
        "q35_window_triples": f"""
WITH {cte},
preds(pred) AS (VALUES {pred_values}),
mw AS (
  SELECT m.*, substring(d.text, CAST(m."end" AS INT) + 1, {win}) AS nxt
  FROM mentions m JOIN d ON d.doc_id = m.doc_id
)
SELECT m1.doc_id, m1.surface AS subj, p.pred, m2.surface AS obj,
       m1."start" AS subj_start, m2."start" AS obj_start
FROM mw m1
CROSS JOIN preds p
JOIN mentions m2 ON m2.doc_id = m1.doc_id
 AND m2."start" = m1."end" + 2 + length(p.pred)
WHERE starts_with(m1.nxt, ' ' || p.pred || ' ')
""",
        # q38: row_number restatement of the max_by(struct) arg-max — the
        # DESC chain mirrors the struct's lexicographic comparison order
        # (ts first, then the remaining row) exactly
        "q38_latest_events": """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY ts DESC, event_id DESC, event_type DESC,
             value DESC, props DESC) AS rn
  FROM events) t
WHERE rn = 1
""",
        # q39: the snapshot-delta classification join restated directly —
        # same md5 digests, same left-join skip condition
        "q39_snapshot_delta": """
WITH old AS (
  SELECT doc_id, md5(text) AS digest FROM documents
  WHERE doc_id % 11 <> 0 AND text IS NOT NULL
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || 'X' ELSE text END)
           AS digest
  FROM documents
  WHERE text IS NOT NULL
)
SELECT n.doc_id, n.digest,
       CASE WHEN o.doc_id IS NULL THEN 'new' ELSE 'changed' END AS status,
       CAST(NULL AS INTEGER) AS old_snap
FROM new n LEFT JOIN old o USING (doc_id)
WHERE o.doc_id IS NULL OR o.digest <> n.digest
""",
        # q40: 2-hop BFS unrolled; h2's NOT EXISTS is the min-dist rule
        "q40_khop": f"""
WITH {edges_chain},
seeds(seed) AS (VALUES {seeds_values}),
eu AS (SELECT DISTINCT src AS u, dst AS v FROM e),
h1 AS (SELECT DISTINCT s.seed, eu.v AS node
       FROM seeds s JOIN eu ON eu.u = s.seed
       WHERE eu.v <> s.seed),
h2 AS (SELECT DISTINCT h1.seed, eu.v AS node
       FROM h1 JOIN eu ON eu.u = h1.node
       WHERE eu.v <> h1.seed
         AND NOT EXISTS (SELECT 1 FROM h1 x
                         WHERE x.seed = h1.seed AND x.node = eu.v))
SELECT seed, node, 1 AS dist FROM h1
UNION ALL
SELECT seed, node, 2 AS dist FROM h2
""",
        "q41_degrees": f"""
WITH {edges_chain},
outd AS (SELECT src AS node, count(*) AS out_deg,
                CAST(sum(weight) AS BIGINT) AS w_out
         FROM e GROUP BY 1),
ind  AS (SELECT dst AS node, count(*) AS in_deg,
                CAST(sum(weight) AS BIGINT) AS w_in
         FROM e GROUP BY 1)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(o.out_deg, 0) AS out_deg,
       coalesce(i.in_deg, 0) AS in_deg,
       coalesce(o.w_out, 0) AS w_out,
       coalesce(i.w_in, 0) AS w_in
FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
""",
        "q42_pagerank": f"""
WITH {edges_chain},
e2 AS (SELECT DISTINCT src, dst FROM e),
nodes AS (SELECT src AS node FROM e2 UNION SELECT dst AS node FROM e2),
deg AS (SELECT src, count(*) AS d FROM e2 GROUP BY 1),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS "rank" FROM nodes),
{pr_iters}
SELECT node, "rank" AS rank FROM r3
""",
        "q43_ntriples_export": f"""
WITH {edges_chain}
SELECT '<http://example.org/kg/e/' || {_nt_sql('src')}
       || '> <http://example.org/kg/p/' || {_nt_sql('pred')}
       || '> <http://example.org/kg/e/' || {_nt_sql('dst')}
       || '> .' AS value
FROM e
""",
        # q44: BGP_PATTERNS restated — one constant-filtered scan per
        # pattern, inner-joined on the shared variables (bag semantics;
        # inner joins commute on multisets, so Spark's greedy join order
        # needs no mirroring here)
        "q44_pattern_match": f"""
WITH {edges_chain}
SELECT p0.a, p0.b, p1.c, p2.d
FROM (SELECT src AS a, dst AS b FROM e WHERE pred = 'join') p0
JOIN (SELECT src AS b, dst AS c FROM e WHERE pred = 'join') p1 USING (b)
JOIN (SELECT src AS c, dst AS d FROM e WHERE pred = 'scan') p2 USING (c)
""",
        # q61: degree-ordered triangle counting over the q28 KG edges —
        # the SAME orientation the engine runs: undirected simple fold,
        # (degree, node id) total order, wedges from oriented
        # out-neighborhoods with the b<c dedup, closed against the
        # oriented edge set, 3 corners per triangle, zero-count nodes
        # kept via the degree table.
        "q61_triangles": f"""
WITH {edges_chain},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY 1
),
ori AS (
  SELECT CASE WHEN lo THEN a ELSE b END AS u,
         CASE WHEN lo THEN b ELSE a END AS v,
         CASE WHEN lo THEN db ELSE da END AS dv
  FROM (
    SELECT und.a, und.b, x.d AS da, y.d AS db,
           (x.d < y.d OR (x.d = y.d AND und.a < und.b)) AS lo
    FROM und
    JOIN deg x ON x.node = und.a
    JOIN deg y ON y.node = und.b
  )
),
tri AS (
  SELECT w1.apex, w1.b, w2.c
  FROM (SELECT u AS apex, v AS b, dv AS rb FROM ori) w1
  JOIN (SELECT u AS apex, v AS c, dv AS rc FROM ori) w2
    ON w1.apex = w2.apex
  JOIN ori z ON z.u = w1.b AND z.v = w2.c
  WHERE w1.rb < w2.rc OR (w1.rb = w2.rc AND w1.b < w2.c)
),
corners AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT apex AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY 1
)
SELECT deg.node, coalesce(corners.triangles, 0) AS triangles
FROM deg LEFT JOIN corners ON corners.node = deg.node
""",
        # q62: page-level co-citation over the q45 anchor pages — the
        # same href scan/resolution/host chain, then distinct
        # (page, host) edges self-joined on the page with a<b, pair
        # counts >= 2, and distinct in-degrees joined alongside. All
        # integers; Jaccard derives at the consumer.
        "q62_cocitation": f"""
WITH {_host_graph_ctes()},
pe AS (
  SELECT DISTINCT url AS s, dst_host2 AS t FROM (
    SELECT url,
           lower(regexp_extract(abs_url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS dst_host2
    FROM resolved
  ) WHERE dst_host2 <> '' AND s <> dst_host2
),
prs AS (
  SELECT l1.t AS a, l2.t AS b, count(*) AS shared
  FROM pe l1 JOIN pe l2 ON l1.s = l2.s
  WHERE l1.t < l2.t
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
ind AS (SELECT t, count(*) AS ind FROM pe GROUP BY 1)
SELECT prs.a, prs.b, prs.shared, ia.ind AS in_a, ib.ind AS in_b
FROM prs
JOIN ind ia ON ia.t = prs.a
JOIN ind ib ON ib.t = prs.b
""",
        # q63: synchronous label propagation, 2 voting rounds unrolled —
        # undirected simple fold, labels start as the node's own id,
        # every round each node adopts the (count DESC, label ASC)
        # argmax over its neighbors' PREVIOUS-round labels.
        "q63_communities": f"""
WITH {edges_chain},
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM e WHERE src <> dst
    UNION ALL
    SELECT dst AS a, src AS b FROM e WHERE src <> dst
  )
),
l0 AS (SELECT DISTINCT a AS node, a AS community FROM und),
v1 AS (
  SELECT und.a AS node, l0.community, count(*) AS c
  FROM und JOIN l0 ON l0.node = und.b GROUP BY 1, 2
),
l1 AS (
  SELECT node, community FROM (
    SELECT node, community,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, community) AS rn
    FROM v1) WHERE rn = 1
),
v2 AS (
  SELECT und.a AS node, l1.community, count(*) AS c
  FROM und JOIN l1 ON l1.node = und.b GROUP BY 1, 2
)
SELECT node, community FROM (
  SELECT node, community,
         row_number() OVER (PARTITION BY node
                            ORDER BY c DESC, community) AS rn
  FROM v2) WHERE rn = 1
""",
        # q64: weighted integer PageRank over the q45 host graph — the
        # same scan/resolution/grouping chain with hg's self-loop rows
        # filtered (host_graph's DEFAULT drops them — nav chrome says
        # nothing about rank; the shared hg CTE is the keep_self q45
        # form), then 2 unrolled mass-splitting iterations
        # (multiply-before-divide order matches the engine's
        # contribution expression verbatim).
        "q64_weighted_pagerank": f"""
WITH {_host_graph_ctes()},
we AS (SELECT src_host AS src, dst_host AS dst,
              CAST(n_links AS BIGINT) AS w FROM hg
       WHERE src_host <> dst_host),
wdeg AS (SELECT src, sum(w) AS d FROM we GROUP BY 1),
wnodes AS (SELECT src AS node FROM we UNION SELECT dst AS node FROM we),
wr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS "rank" FROM wnodes),
{wpr_iters}
SELECT node, "rank" AS rank FROM wr2
""",
        # q65: personalized integer PageRank over the KG edges — q42's
        # e2/nodes/deg chain, seeded init (pr0) and seeded base term.
        "q65_personalized_pagerank": f"""
WITH {edges_chain},
e2 AS (SELECT DISTINCT src, dst FROM e),
nodes AS (SELECT src AS node FROM e2 UNION SELECT dst AS node FROM e2),
deg AS (SELECT src, count(*) AS d FROM e2 GROUP BY 1),
pr0 AS (SELECT node, CASE WHEN {seed_in} THEN CAST(1000000000 AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END AS "rank" FROM nodes),
{ppr_iters}
SELECT node, "rank" AS rank FROM pr2
""",
        # q45: the hyperlink host graph — anchor regexp scan, fragment
        # strip, the same 4-branch resolution CASE (order matters: '//'
        # before '/'), host extraction ('' on no authority), grouped
        # anchor counts. html synthesized from documents with the same
        # concat the Spark side uses (_synth_link_pages).
        "q45_host_graph": f"""
WITH {_host_graph_ctes()}
SELECT src_host, dst_host, n_links FROM hg
""",
        # q48: the domain-level fold of the q45 host graph — registered
        # domain = last 2 labels, or 3 when the 2nd-to-last is a ccSLD
        # label; intra-domain edges dropped, counts summed
        "q48_domain_graph": f"""
WITH {_host_graph_ctes()},
folded AS (
  SELECT {_domain_sql('src_host')} AS src_domain,
         {_domain_sql('dst_host')} AS dst_domain,
         n_links
  FROM hg
)
SELECT src_domain, dst_domain, CAST(sum(n_links) AS BIGINT) AS n_links
FROM folded
WHERE src_domain <> dst_domain
GROUP BY 1, 2
""",
        # q49: URL canonicalization — every normalize_url rule restated:
        # fragment strip, scheme/host lower, default-port CASE, empty
        # path -> '/', tracking-param filter, lexicographic param sort
        "q49_url_normalize": """
WITH urls AS (
  SELECT CASE doc_id % 4
           WHEN 0 THEN 'https://example.com/item/' || (doc_id // 4)
                       || '?a=1&b=2&c=3?x'
           WHEN 1 THEN 'HTTPS://Example.Com:443/item/' || (doc_id // 4)
                       || '?b=2&c=3?x&a=1'
           WHEN 2 THEN 'https://example.com/item/' || (doc_id // 4)
                       || '?a=1&utm_campaign=z&c=3?x&b=2#frag'
           ELSE 'https://example.com:443/item/' || (doc_id // 4)
                || '?gclid=1&c=3?x&b=2&a=1'
         END AS url
  FROM documents
),
parts AS (
  SELECT lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM (SELECT split_part(url, '#', 1) AS u FROM urls)
),
comps AS (
  SELECT scheme,
         lower(regexp_extract(rest, '^([^/?]*)', 1)) AS host,
         regexp_replace(rest, '^[^/?]*', '') AS path_q
  FROM parts
),
norm AS (
  SELECT scheme,
         CASE WHEN scheme = 'http' AND host LIKE '%:80'
                THEN left(host, len(host) - 3)
              WHEN scheme = 'https' AND host LIKE '%:443'
                THEN left(host, len(host) - 4)
              ELSE host END AS host,
         CASE WHEN split_part(path_q, '?', 1) = '' THEN '/'
              ELSE split_part(path_q, '?', 1) END AS path,
         CASE WHEN contains(path_q, '?')
                THEN substr(path_q, position('?' in path_q) + 1)
              ELSE '' END AS query
  FROM comps
),
canon AS (
  SELECT scheme || '://' || host || path ||
         CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
  FROM (
    SELECT scheme, host, path,
           array_to_string(list_sort(list_filter(
               string_split(query, '&'),
               p -> NOT (starts_with(p, 'utm_')
                         OR regexp_matches(p,
                              '^(gclid|fbclid|msclkid|mc_eid|igshid)=')
                         OR p = ''))), '&') AS qs
    FROM norm
  )
)
SELECT canonical_url, count(*) AS n_variants
FROM canon
GROUP BY 1
""",
        # q50: head-signal extraction — the three pagemeta regexps (first
        # plain-text title; robots meta name-before-content either quote
        # style; rel=canonical) over the identically-constructed html
        "q50_page_meta": """
WITH pages AS (
  SELECT 'https://m' || (doc_id % 5) || '.example.com/p/' || doc_id AS url,
         '<html><head><title>Doc ' || doc_id || ' overview</title>'
         || CASE WHEN doc_id % 3 = 0
                 THEN '<meta name="robots" content="NOINDEX, nofollow">'
                 WHEN doc_id % 3 = 1
                 THEN '<meta name=''robots'' content=''index, follow''>'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN '<link rel=''canonical'' href=''/p/' || doc_id
                      || '''>'
                 ELSE '' END
         || '</head><body><p>x</p></body></html>' AS html
  FROM documents
)
SELECT url,
       regexp_extract(html, '<title[^>]*>([^<]*)</title>', 1) AS title,
       lower(regexp_extract(html,
           '<meta\\s[^>]*name\\s*=\\s*["'']robots["''][^>]*'
           || 'content\\s*=\\s*["'']([^"'']*)["'']', 1)) AS robots,
       contains(lower(regexp_extract(html,
           '<meta\\s[^>]*name\\s*=\\s*["'']robots["''][^>]*'
           || 'content\\s*=\\s*["'']([^"'']*)["'']', 1)),
           'noindex') AS noindex,
       regexp_extract(html,
           '<link\\s[^>]*rel\\s*=\\s*["'']canonical["''][^>]*'
           || 'href\\s*=\\s*["'']([^"'']*)["'']', 1) AS canonical
FROM pages
""",
        # q51: HITS over the host graph — hg re-filtered to the
        # engine's keep_self=False default, then the generated 2-round
        # integer hub/authority chain
        "q51_hits": f"""
WITH {_host_graph_ctes()},
e3 AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM hg
       WHERE src_host <> dst_host),
hnodes AS (SELECT src AS node FROM e3 UNION SELECT dst AS node FROM e3),
h0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS h FROM hnodes),
{hits_iters}
SELECT h2.node, h2.h AS hub, a2.a AS authority
FROM h2 JOIN a2 ON a2.node = h2.node
""",
        # q55: the sitemap <loc> scan restated — same (?is) lazy-group
        # regexp (RE2 and java.util.regex agree on leftmost-first
        # non-greedy semantics), same &amp; decode and is_index rlike
        # q60: both charset-declaration regexps + the precedence
        # coalesce restated (nullif turns the no-match '' into the
        # http-equiv fallback on both engines)
        "q60_charset": """
WITH cpages AS (
  SELECT 'https://c.org/p/' || doc_id AS url,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '<html><head><META CHARSET="ISO-8859-1"><title>t'
                       || doc_id || '</title></head></html>'
           WHEN 1 THEN '<html><head><meta charset=utf-8><title>t'
                       || doc_id || '</title></head></html>'
           WHEN 2 THEN '<html><head><meta http-equiv="Content-Type" '
                       || 'content="text/html; charset=Windows-1252">'
                       || '<title>t' || doc_id || '</title></head></html>'
           ELSE '<html><head><title>t' || doc_id
                || '</title></head></html>'
         END AS html
  FROM documents
)
SELECT url,
       lower(coalesce(
         nullif(regexp_extract(html,
           '(?i)<meta\\s[^>]*charset\\s*=\\s*["'']?([A-Za-z0-9_.:-]+)',
           1), ''),
         regexp_extract(html,
           '(?i)<meta\\s[^>]*content\\s*=\\s*["''][^"'']*'
           || 'charset=([A-Za-z0-9_.:-]+)', 1))) AS charset
FROM cpages
""",
        # q59: the WAT record restated — q50's three head regexps, the
        # q45 href scan as an in-row list (list_transform quoting — the
        # corpus alphabet needs no JSON escapes; the engine writer DOES
        # escape, pinned by the hostile-text pytest case), strlen = byte
        # Content-Length over the planted-'é' payload
        "q59_wat_export": """
WITH wpages AS (
  SELECT 'https://w' || (doc_id % 6) || '.example.org/p/' || doc_id AS url,
         '2025-03-0' || ((doc_id % 9) + 1) || 'T09:00:00Z' AS ts,
         '<html><head><TITLE>Doc ' || doc_id || ' é</TITLE>'
         || CASE WHEN doc_id % 4 = 0
                 THEN '<meta name="robots" content="NOINDEX, nofollow">'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN '<link rel="canonical" href="https://c'
                      || (doc_id % 6) || '.org/p/' || doc_id || '">'
                 ELSE '' END
         || '</head><body>'
         || CASE WHEN doc_id % 7 = 0 THEN 'no anchors here'
                 ELSE '<a href="/l/' || doc_id
                      || '">x</a> <A HREF="https://o' || (doc_id % 6)
                      || '.org/y/' || doc_id || '">y</A>' END
         || '</body></html>' AS html
  FROM documents
),
payloads AS (
  SELECT url, ts,
         '{"url":"' || url || '","title":"'
         || regexp_extract(html, '(?i)<title[^>]*>([^<]*)</title>', 1)
         || '","robots":"'
         || lower(regexp_extract(html,
              '(?i)<meta\\s[^>]*name\\s*=\\s*["'']robots["''][^>]*'
              || 'content\\s*=\\s*["'']([^"'']*)["'']', 1))
         || '","canonical":"'
         || regexp_extract(html,
              '(?i)<link\\s[^>]*rel\\s*=\\s*["'']canonical["''][^>]*'
              || 'href\\s*=\\s*["'']([^"'']*)["'']', 1)
         || '","links":['
         -- array_to_string of an EMPTY list is NULL in DuckDB (Spark
         -- concat_ws gives ''): coalesce restores the no-anchor case
         || coalesce(array_to_string(list_transform(
              regexp_extract_all(html,
                '(?i)<a\\s[^>]*href\\s*=\\s*["'']([^"'']*)["'']', 1),
              x -> '"' || x || '"'), ','), '')
         || ']}' AS payload
  FROM wpages
)
SELECT 'WARC/1.0' || e'\\r\\n'
    || 'WARC-Type: metadata' || e'\\r\\n'
    || 'WARC-Record-ID: <urn:uuid:'
    || substr(md5('warc-record-id:' || url || ':' || ts), 1, 8) || '-'
    || substr(md5('warc-record-id:' || url || ':' || ts), 9, 4) || '-5'
    || substr(md5('warc-record-id:' || url || ':' || ts), 14, 3) || '-a'
    || substr(md5('warc-record-id:' || url || ':' || ts), 18, 3) || '-'
    || substr(md5('warc-record-id:' || url || ':' || ts), 21, 12)
    || '>' || e'\\r\\n'
    || 'WARC-Target-URI: ' || url || e'\\r\\n'
    || 'WARC-Date: ' || ts || e'\\r\\n'
    || 'Content-Type: application/json' || e'\\r\\n'
    || 'Content-Length: ' || strlen(payload) || e'\\r\\n\\r\\n'
    || payload || e'\\r\\n\\r\\n' AS value
FROM payloads
""",
        # q57: the politeness scheduler restated — group machinery with
        # the delay kind regex, min() delay per host, the allowed filter
        # (q52's restatement over this corpus), and both ranking windows;
        # the offset multiply is one IEEE op on both engines
        "q57_frontier_plan": """
WITH robots AS (
  SELECT DISTINCT 'h' || (doc_id % 10) || '.example.com' AS host,
         e'User-agent: gptbot\\nCrawl-delay: 30\\nDisallow: /\\n\\n'
         || 'User-agent: *' || e'\\nDisallow: /p' || (doc_id % 10)
         || e'/\\n'
         || CASE WHEN (doc_id % 10) % 3 = 0 THEN e'Crawl-delay: 2.5\\n'
                 WHEN (doc_id % 10) % 3 = 1 THEN e'Crawl-delay: 4\\n'
                 ELSE '' END
         || CASE WHEN (doc_id % 10) % 2 = 0
                 THEN e'\\nUser-agent: newsbot\\nUser-agent: *\\n'
                      || e'Crawl-delay: 1\\nCrawl-delay: junk\\n'
                      || e'Allow: /news/\\n'
                 ELSE '' END AS body
  FROM documents
),
rlines AS (
  SELECT host, z[1] AS pos,
         trim(regexp_replace(z[2], '#.*$', '')) AS line
  FROM (SELECT host, unnest(list_zip(
            range(1, len(string_split(body, e'\\n')) + 1),
            string_split(body, e'\\n'))) AS z
        FROM robots)
),
kinds AS (
  SELECT host, pos,
         lower(regexp_extract(line,
             '(?i)^(user-agent|allow|disallow|crawl-delay)\\s*:', 1))
            AS kind,
         trim(regexp_extract(line, '^[^:]*:(.*)$', 1)) AS value
  FROM rlines
  WHERE regexp_extract(line,
            '(?i)^(user-agent|allow|disallow|crawl-delay)\\s*:', 1) <> ''
),
g1 AS (SELECT *, lag(kind) OVER (PARTITION BY host ORDER BY pos) AS lagk
       FROM kinds),
g2 AS (SELECT *, sum(CASE WHEN kind = 'user-agent'
                          AND (lagk IS NULL OR lagk <> 'user-agent')
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS gid
       FROM g1),
g3 AS (SELECT *, max(CASE WHEN kind = 'user-agent' AND value = '*'
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host, gid) AS governs
       FROM g2),
rrules AS (
  SELECT host, kind AS rule, value AS path FROM g3
  WHERE governs = 1 AND gid > 0
    AND kind IN ('allow', 'disallow') AND value <> ''
),
rdelays AS (
  SELECT host, min(CAST(value AS DOUBLE)) AS delay_s FROM g3
  WHERE governs = 1 AND gid > 0 AND kind = 'crawl-delay'
    AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$')
  GROUP BY host
),
furls AS (
  SELECT 'https://h' || (doc_id % 10) || '.example.com'
         || CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN '/p' || (doc_id % 10) || '/x/' || doc_id
              WHEN 1 THEN '/a/' || doc_id
              WHEN 2 THEN '/news/' || doc_id
              ELSE '/b/' || doc_id
            END AS url,
         CAST(doc_id % 7 AS INT) AS prio
  FROM documents
),
u AS (
  SELECT url, prio,
         lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS h,
         CASE WHEN p = '' THEN '/' ELSE p END AS upath
  FROM (SELECT url, prio, regexp_replace(regexp_replace(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
              '#.*$', '') AS p
        FROM furls)
),
ukeys AS (SELECT DISTINCT h, upath FROM u),
cand AS (
  SELECT k.h, k.upath, r.rule, r.path
  FROM ukeys k JOIN rrules r ON r.host = k.h
  WHERE starts_with(k.upath, r.path)
),
winner AS (
  SELECT h, upath, rule FROM (
    SELECT *, row_number() OVER (
        PARTITION BY h, upath
        ORDER BY len(path) DESC, (rule = 'allow') DESC, path, rule) AS rn
    FROM cand)
  WHERE rn = 1
),
allowed AS (
  SELECT u.url, u.prio, u.h AS host
  FROM u LEFT JOIN winner w ON w.h = u.h AND w.upath = u.upath
  WHERE coalesce(w.rule, 'allow') <> 'disallow'
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY host ORDER BY prio DESC, url) AS fetch_rank
  FROM allowed
)
SELECT r.url, r.prio, r.host,
       CAST(r.fetch_rank AS INTEGER) AS fetch_rank,
       CAST(r.fetch_rank - 1 AS DOUBLE)
         * coalesce(d.delay_s, 1.0) AS fetch_offset_s
FROM ranked r LEFT JOIN rdelays d ON d.host = r.host
WHERE r.fetch_rank <= 20
""",
        # q58: the global Sitemap line scan restated (comment strip,
        # case-insensitive directive, no-space form, group-independent)
        "q58_robots_sitemaps": """
WITH robots AS (
  SELECT DISTINCT 'h' || (doc_id % 10) || '.example.com' AS host,
         e'User-agent: *\\nDisallow: /x/\\n'
         || 'Sitemap: https://h' || (doc_id % 10)
         || e'.example.com/sitemap.xml # primary\\n'
         || CASE WHEN (doc_id % 10) % 2 = 0
                 THEN 'User-agent: bot' || e'\\nsitemap:https://h'
                      || (doc_id % 10) || e'.example.com/extra.xml\\n'
                 ELSE '' END AS body
  FROM documents
),
rlines AS (
  SELECT host, trim(regexp_replace(unnest(string_split(body, e'\\n')),
                                   '#.*$', '')) AS line
  FROM robots
)
SELECT host,
       trim(regexp_extract(line, '(?i)^sitemap\\s*:(.*)$', 1)) AS sitemap
FROM rlines
WHERE trim(regexp_extract(line, '(?i)^sitemap\\s*:(.*)$', 1)) <> ''
""",
        # q56: surt_key + the CDXJ record layout restated rule-by-rule —
        # split_part/regexp twins of the Column chain, list_reverse/
        # list_sort for label reversal and param sort (binary collation
        # on both engines — the planted 'c=3&B=2&a=1' pins it), md5 over
        # the same UTF-8 payload, strlen = octet_length
        "q56_cdx_index": """
WITH cap AS (
  SELECT CASE CAST(doc_id % 7 AS INT)
           WHEN 0 THEN 'https://WWW.Ex' || (doc_id % 5) || '.COM/P/'
                       || doc_id || '?b=2&a=1#frag'
           WHEN 1 THEN 'http://www2.ex' || (doc_id % 5) || '.com:80/p/'
                       || doc_id
           WHEN 2 THEN 'https://u:p@ex' || (doc_id % 5) || '.com:443/Q/'
                       || doc_id
           WHEN 3 THEN 'http://ex' || (doc_id % 5) || '.com:8080/r/'
                       || doc_id || '?'
           WHEN 4 THEN 'https://sub.ex' || (doc_id % 5) || '.com'
           ELSE 'https://ex' || (doc_id % 5) || '.com/z/' || doc_id
                || '?c=3&B=2&a=1'
         END AS url,
         '2025-03-0' || ((doc_id % 9) + 1) || 'T08:00:0' || (doc_id % 10)
            || 'Z' AS ts,
         '<html>' || text || '</html>' AS payload
  FROM documents
),
p1 AS (
  SELECT url, ts, payload,
         regexp_replace(lower(split_part(url, '#', 1)),
                        '^[a-z][a-z0-9+.-]*://', '') AS rest
  FROM cap
),
p2 AS (
  SELECT *, regexp_replace(
               regexp_replace(regexp_extract(rest, '^([^/?]*)', 1),
                              '^.*@', ''),
               ':(80|443)$', '') AS auth,
            regexp_replace(rest, '^[^/?]*', '') AS path_q
  FROM p1
),
p3 AS (
  SELECT *, regexp_replace(split_part(auth, ':', 1),
                           '^www[0-9]*\\.', '') AS host,
            CASE WHEN position(':' IN auth) > 0
                 THEN ':' || regexp_extract(auth, ':([^:]*)$', 1)
                 ELSE '' END AS port,
            split_part(path_q, '?', 1) AS path0,
            CASE WHEN position('?' IN path_q) > 0
                 THEN substr(path_q, position('?' IN path_q) + 1)
                 ELSE '' END AS query
  FROM p2
),
p4 AS (
  SELECT *, array_to_string(list_reverse(string_split(host, '.')), ',')
            || port AS rev,
            CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
            array_to_string(list_sort(string_split(query, '&')), '&') AS qs
  FROM p3
)
SELECT rev || ')' || path
       || CASE WHEN qs = '' THEN '' ELSE '?' || qs END
       || ' ' || substr(regexp_replace(ts, '[^0-9]', '', 'g'), 1, 14)
       || ' {"url":"' || url || '","mime":"text/html","status":"200",'
       || '"digest":"' || md5(payload) || '","length":"'
       || strlen(payload) || '"}' AS value
FROM p4
""",
        "q55_sitemap_urls": """
WITH smaps AS (
  SELECT 'https://s' || (doc_id % 6) || '.org/sitemap' || doc_id
         || '.xml' AS url,
         CASE WHEN doc_id % 20 = 0
              THEN '<sitemapindex><sitemap><loc>https://s'
                   || (doc_id % 6) || '.org/maps/' || doc_id
                   || '.xml</loc></sitemap></sitemapindex>'
              ELSE '<urlset><url><loc>https://s' || (doc_id % 6)
                   || '.org/p/' || doc_id
                   || '?a=1&amp;b=2</loc></url><url><LOC> https://s'
                   || (doc_id % 6) || '.org/q/' || doc_id
                   || ' </LOC></url><url><loc><![CDATA[https://s'
                   || (doc_id % 6) || '.org/c/' || doc_id
                   || ']]></loc></url></urlset>'
         END AS body
  FROM documents
)
SELECT url AS sitemap_url,
       replace(unnest(regexp_extract_all(body,
           '(?is)<loc[^>]*>\\s*(?:<!\\[CDATA\\[)?(.*?)(?:\\]\\]>)?\\s*</loc>',
           1)), '&amp;', '&') AS loc,
       regexp_matches(body, '(?is)<\\s*sitemapindex[\\s>]') AS is_index
FROM smaps
""",
        # q54: the WET record layout restated verbatim — strlen is
        # DuckDB's BYTE length (octet_length's twin); the planted 'é'
        # makes a char-count confusion hash-visible
        "q54_wet_export": """
WITH wpages AS (
  SELECT 'https://w' || (doc_id % 9) || '.example.com/p/' || doc_id AS url,
         '2025-03-0' || ((doc_id % 9) + 1) || 'T08:00:00Z' AS ts,
         CASE WHEN doc_id % 17 = 0 THEN NULL
              ELSE text || ' é' END AS t
  FROM documents
)
SELECT 'WARC/1.0' || e'\\r\\n'
    || 'WARC-Type: conversion' || e'\\r\\n'
    || 'WARC-Record-ID: <urn:uuid:'
    || substr(md5('warc-record-id:' || url || ':' || ts), 1, 8) || '-'
    || substr(md5('warc-record-id:' || url || ':' || ts), 9, 4) || '-5'
    || substr(md5('warc-record-id:' || url || ':' || ts), 14, 3) || '-a'
    || substr(md5('warc-record-id:' || url || ':' || ts), 18, 3) || '-'
    || substr(md5('warc-record-id:' || url || ':' || ts), 21, 12)
    || '>' || e'\\r\\n'
    || 'WARC-Target-URI: ' || url || e'\\r\\n'
    || 'WARC-Date: ' || ts || e'\\r\\n'
    || 'Content-Type: text/plain' || e'\\r\\n'
    || 'Content-Length: ' || strlen(t) || e'\\r\\n\\r\\n'
    || t || e'\\r\\n\\r\\n' AS value
FROM wpages WHERE t IS NOT NULL
""",
        # q53: unordered-pair co-occurrence with marginals over the
        # same mentions CTE (distinct (doc, lower(surface)) then a
        # doc-keyed self-join with e1 < e2)
        "q53_cooccurrence": f"""
WITH {cte},
de AS (SELECT DISTINCT doc_id AS doc, lower(surface) AS e FROM mentions),
nc AS (SELECT count(DISTINCT doc) AS n_corpus FROM de),
cpairs AS (
  SELECT l.e AS e1, r.e AS e2, count(*) AS n_docs
  FROM de l JOIN de r ON l.doc = r.doc AND l.e < r.e
  GROUP BY 1, 2 HAVING count(*) >= 2
),
marg AS (SELECT e, count(*) AS n FROM de GROUP BY 1)
SELECT p.e1, p.e2, p.n_docs, m1.n AS n_e1, m2.n AS n_e2, nc.n_corpus
FROM cpairs p
JOIN marg m1 ON m1.e = p.e1
JOIN marg m2 ON m2.e = p.e2
CROSS JOIN nc
""",
        # q52: robots.txt parsing + frontier decision — the same line
        # explosion (ordinality via list_zip with a range), comment
        # strip, lag/sum grouping windows, *-group governance, and
        # longest-match/Allow-wins ranking window as kg/robots.py
        "q52_robots_frontier": """
WITH robots AS (
  SELECT DISTINCT 'h' || (doc_id % 10) || '.example.com' AS host,
         e'# policy\\nUser-agent: gptbot\\nDisallow: /\\n\\n'
         || 'User-agent: *' || e'\\nDisallow: /p' || (doc_id % 10)
         || e'/\\nAllow: /p' || (doc_id % 10)
         || e'/pub/\\nDisallow: /news\\nDisallow:\\n'
         || CASE WHEN (doc_id % 10) % 2 = 0
                 THEN e'\\nUser-agent: newsbot\\nUser-agent: *\\n'
                      || 'Allow: /news/'
                 ELSE '' END AS body
  FROM documents
),
rlines AS (
  SELECT host, z[1] AS pos,
         trim(regexp_replace(z[2], '#.*$', '')) AS line
  FROM (SELECT host, unnest(list_zip(
            range(1, len(string_split(body, e'\\n')) + 1),
            string_split(body, e'\\n'))) AS z
        FROM robots)
),
kinds AS (
  SELECT host, pos,
         lower(regexp_extract(line,
             '(?i)^(user-agent|allow|disallow)\\s*:', 1)) AS kind,
         trim(regexp_extract(line, '^[^:]*:(.*)$', 1)) AS value
  FROM rlines
  WHERE regexp_extract(line,
            '(?i)^(user-agent|allow|disallow)\\s*:', 1) <> ''
),
g1 AS (SELECT *, lag(kind) OVER (PARTITION BY host ORDER BY pos) AS lagk
       FROM kinds),
g2 AS (SELECT *, sum(CASE WHEN kind = 'user-agent'
                          AND (lagk IS NULL OR lagk <> 'user-agent')
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS gid
       FROM g1),
g3 AS (SELECT *, max(CASE WHEN kind = 'user-agent' AND value = '*'
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host, gid) AS governs
       FROM g2),
rrules AS (
  SELECT host, kind AS rule, value AS path FROM g3
  WHERE governs = 1 AND gid > 0 AND kind <> 'user-agent' AND value <> ''
),
furls AS (
  SELECT 'https://h' || (doc_id % 10) || '.example.com'
         || CASE doc_id % 5
              WHEN 0 THEN '/p' || (doc_id % 10) || '/x/' || doc_id
              WHEN 1 THEN '/p' || (doc_id % 10) || '/pub/' || doc_id
              WHEN 2 THEN '/news/' || doc_id
              WHEN 3 THEN '/' || doc_id
              ELSE '/p' || (doc_id % 10) || '/pub'
            END AS url
  FROM documents
),
u AS (
  SELECT url,
         lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS h,
         CASE WHEN p = '' THEN '/' ELSE p END AS upath
  FROM (SELECT url, regexp_replace(regexp_replace(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
              '#.*$', '') AS p
        FROM furls)
),
ukeys AS (SELECT DISTINCT h, upath FROM u),
cand AS (
  SELECT k.h, k.upath, r.rule, r.path
  FROM ukeys k JOIN rrules r ON r.host = k.h
  WHERE starts_with(k.upath, r.path)
),
winner AS (
  SELECT h, upath, rule FROM (
    SELECT *, row_number() OVER (
        PARTITION BY h, upath
        ORDER BY len(path) DESC, (rule = 'allow') DESC, path, rule) AS rn
    FROM cand)
  WHERE rn = 1
)
SELECT u.url, coalesce(w.rule, 'allow') <> 'disallow' AS allowed
FROM u LEFT JOIN winner w ON w.h = u.h AND w.upath = u.upath
""",
        # q66: RFC 9309 §2.2.3 wildcard rule paths — the Column-built
        # regex compilation (metachar escape, * -> .*, trailing-$
        # re-anchor) and the wild-vs-prefix dispatch restated in
        # DuckDB/RE2. The rules table is restated literally: the bodies
        # are parse-trivial one-group constants and parsing is pinned
        # by q52/q57/q58; this oracle pins the MATCHER.
        "q66_robots_wildcards": r"""
WITH hosts AS (
  SELECT DISTINCT 'w' || (doc_id % 10) || '.example.com' AS host
  FROM documents
),
rr(rule, path) AS (VALUES
  ('disallow', '/*.php$'), ('disallow', '/cgi*bin/'),
  ('allow', '/p/pub*'), ('disallow', '/p/'), ('disallow', '/a$b')),
rrules AS (
  SELECT host, rule, path,
         contains(path, '*') OR ends_with(path, '$') AS wild,
         '^' || replace(regexp_replace(regexp_replace(path, '\$$', ''),
                 '([\\.\[\]{}()+?^$|])', '\\\0', 'g'), '*', '.*')
             || CASE WHEN ends_with(path, '$') THEN '$' ELSE '' END AS pat
  FROM hosts, rr
),
furls AS (
  SELECT 'https://w' || (doc_id % 10) || '.example.com'
         || CASE CAST(doc_id % 7 AS INT)
              WHEN 0 THEN '/p/pub' || doc_id
              WHEN 1 THEN '/p/x/' || doc_id
              WHEN 2 THEN '/index' || doc_id || '.php'
              WHEN 3 THEN '/index' || doc_id || '.php?q=1'
              WHEN 4 THEN CASE WHEN doc_id % 2 = 0
                               THEN '/cgibin/' || doc_id
                               ELSE '/cgi-' || doc_id || '-bin/x' END
              WHEN 5 THEN '/a$b/' || doc_id
              ELSE '/free/' || doc_id
            END AS url
  FROM documents
),
u AS (
  SELECT url,
         lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS h,
         CASE WHEN p = '' THEN '/' ELSE p END AS upath
  FROM (SELECT url, regexp_replace(regexp_replace(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
              '#.*$', '') AS p
        FROM furls)
),
ukeys AS (SELECT DISTINCT h, upath FROM u),
cand AS (
  SELECT k.h, k.upath, r.rule, r.path
  FROM ukeys k JOIN rrules r ON r.host = k.h
  WHERE CASE WHEN r.wild THEN regexp_matches(k.upath, r.pat)
             ELSE starts_with(k.upath, r.path) END
),
winner AS (
  SELECT h, upath, rule FROM (
    SELECT *, row_number() OVER (
        PARTITION BY h, upath
        ORDER BY len(path) DESC, (rule = 'allow') DESC, path, rule) AS rn
    FROM cand)
  WHERE rn = 1
)
SELECT u.url, coalesce(w.rule, 'allow') <> 'disallow' AS allowed
FROM u LEFT JOIN winner w ON w.h = u.h AND w.upath = u.upath
""",
        # q67: PPM decode + 16-bin histogram restated arithmetically —
        # raster byte j = (id*31 + j*7) mod 256, histogram bin = byte
        # div 16 (np.histogram bins=16 over (0,256)), feature =
        # count/48.0 rounded once to REAL (same exact double -> same
        # float32 bits as Spark). id%7==0 rows are corrupt (truncated
        # raster -> decode None): ok false, 16 zero features.
        "q67_image_features": r"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 7 = 0 AS corrupt FROM documents
),
b AS (
  SELECT media_id, ((media_id * 31 + j.j * 7) % 256) // 16 AS bin
  FROM m, generate_series(0, 47) AS j(j)
  WHERE NOT corrupt
),
hist AS (
  SELECT media_id, bin, count(*) AS c FROM b GROUP BY media_id, bin
),
grid AS (
  SELECT media_id, corrupt, g.g AS bin
  FROM m, generate_series(0, 15) AS g(g)
)
SELECT g.media_id, NOT g.corrupt AS ok, CAST(g.bin AS INT) AS bin,
       CAST(CASE WHEN g.corrupt THEN 0.0
                 ELSE coalesce(h.c, 0) / 48.0 END AS REAL) AS feature
FROM grid g
LEFT JOIN hist h ON h.media_id = g.media_id AND h.bin = g.bin
""",
        # q68: PCM WAV decode + windowed RMS + zero crossings restated —
        # sample m = (id*13 + j*29) mod 256 - 128, decoded float is
        # m/128 (exact f32), window RMS = sqrt(sum(m^2)/16384/8) with
        # one f64 sqrt then REAL cast (innocuous double rounding);
        # zero crossings = sign changes over the lag scan. id%7==0
        # rows are empty payloads: ok false, zero rms/crossings.
        "q68_audio_features": r"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 7 = 0 AS corrupt FROM documents
),
samp AS (
  SELECT media_id, j.j AS j,
         (media_id * 13 + j.j * 29) % 256 - 128 AS mv
  FROM m, generate_series(0, 63) AS j(j)
  WHERE NOT corrupt
),
win AS (
  SELECT media_id, j // 8 AS win,
         sqrt(sum(CAST(mv AS DOUBLE) * mv) / 16384.0 / 8.0) AS rms_d
  FROM samp GROUP BY media_id, j // 8
),
zc AS (
  SELECT media_id,
         sum(CASE WHEN (mv < 0) <> (pmv < 0) THEN 1 ELSE 0 END) AS z
  FROM (SELECT media_id, mv,
               lag(mv) OVER (PARTITION BY media_id ORDER BY j) AS pmv
        FROM samp)
  WHERE pmv IS NOT NULL
  GROUP BY media_id
),
grid AS (
  SELECT media_id, corrupt, g.g AS win
  FROM m, generate_series(0, 7) AS g(g)
)
SELECT g.media_id, NOT g.corrupt AS ok, CAST(g.win AS INT) AS win,
       CAST(CASE WHEN g.corrupt THEN 0.0 ELSE w.rms_d END AS REAL) AS rms,
       CAST(CASE WHEN g.corrupt THEN 0
                 ELSE coalesce(z.z, 0) END AS INT) AS zero_crossings
FROM grid g
LEFT JOIN win w ON w.media_id = g.media_id AND w.win = g.win
LEFT JOIN zc z ON z.media_id = g.media_id
""",
        # q46: anchor-text alias-prior dictionary — paired href+text
        # capture (list_zip of the two capture streams, z[1]/z[2]),
        # the same resolution CASE as q45 folded to host, normalized
        # anchor counts, per-anchor rank (count desc, host asc).
        "q46_anchor_dictionary": f"""
WITH {_anchor_dict_ctes()}
SELECT anchor, dst_host, n_links, rank FROM dict
""",
        # q47: homepage-seeded alias discovery — the q46 dictionary's
        # top-ranked rows joined to the seed host->entity table
        "q47_anchor_aliases": f"""
WITH {_anchor_dict_ctes()},
seed(host, canonical_id, label) AS (VALUES {_anchor_seed_values()})
SELECT d.anchor AS alias, s.canonical_id, s.label,
       CAST(d.n_links AS INT) AS prior
FROM dict d JOIN seed s ON d.dst_host = s.host
WHERE d.rank <= 3 AND d.n_links >= 2
""",
    }


def _anchor_seed_values() -> str:
    return ", ".join(f"('{h}', '{c}', '{l}')" for h, c, l in
                     ANCHOR_SEED_HOSTS)


def _domain_sql(col: str) -> str:
    """DuckDB twin of kg/weblinks.py::domain_of (last-2-labels with the
    ccSLD 3-label CASE)."""
    from quickner_spark.kg.weblinks import CC_SLD

    slds = ", ".join(f"'{s}'" for s in CC_SLD)
    p = f"string_split({col}, '.')"
    return (f"CASE WHEN len({p}) <= 1 THEN {col} "
            f"WHEN len({p}) >= 3 AND {p}[-2] IN ({slds}) "
            f"THEN array_to_string({p}[-3:], '.') "
            f"ELSE array_to_string({p}[-2:], '.') END")


def _link_pages_cte() -> str:
    """The synthesized anchor-pages CTE shared by q45/q46/q47/q48 —
    ONE copy, so an edit cannot desynchronize the four oracles from
    _synth_link_pages."""
    return """pages AS (
  SELECT 'https://d' || (doc_id % 7) || '.example.com/docs/' || doc_id AS url,
         '<nav><a href="/about">about</a> <a href=\'\'p/' || (doc_id % 5)
         || '\'\'\'\'>rel</a></nav><p><a href="https://h' || (doc_id % 11)
         || '.example.org/x#sec">ext</a>'
         || CASE WHEN doc_id % 2 = 0
                 THEN '<a href="https://h' || (doc_id % 11)
                      || '.example.org/y">again</a>'
                 ELSE '' END
         || '<a href=\'\'//cdn' || (doc_id % 3)
         || '.example.net/a.js\'\'>cdn</a>'
         || '<a href="mailto:a@b.c">mail</a></p>' AS html
  FROM documents
)"""


def _resolve_abs_sql(h: str, url: str) -> str:
    """DuckDB twin of kg/weblinks.py::resolve_href (fragment already
    stripped from ``h``) — shared by the q45 and q46 CTE chains."""
    return f"""CASE WHEN regexp_matches({h}, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN {h}
              WHEN {h} LIKE '//%' THEN
                regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)
                || ':' || {h}
              WHEN {h} LIKE '/%' THEN
                regexp_extract({url},
                    '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) || {h}
              ELSE
                regexp_extract({url},
                    '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) || '/' || {h}
         END"""


def _host_graph_ctes() -> str:
    """Shared DuckDB CTE chain for q45/q48: synthesized anchor pages ->
    href extraction -> resolution -> ``hg`` (the grouped host graph,
    keep_self semantics). The (?i) matches kg/weblinks.py::HREF_PATTERN's
    case-insensitive tag/attribute names."""
    return f"""{_link_pages_cte()},
links AS (
  SELECT url,
         unnest(regexp_extract_all(
             html, '(?i)<a\\s[^>]*href\\s*=\\s*["'']([^"'']*)["'']', 1)) AS href
  FROM pages
),
resolved AS (
  SELECT url,
         {_resolve_abs_sql('h', 'url')} AS abs_url
  FROM (SELECT url, split_part(href, '#', 1) AS h FROM links)
),
hosts AS (
  SELECT lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS src_host,
         lower(regexp_extract(abs_url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS dst_host
  FROM resolved
),
hg AS (
  SELECT src_host, dst_host, count(*) AS n_links
  FROM hosts
  WHERE src_host <> '' AND dst_host <> ''
  GROUP BY 1, 2
)"""


def _anchor_dict_ctes() -> str:
    """Shared DuckDB CTE chain for q46/q47: synthesized anchor pages ->
    paired extraction -> resolution -> counts -> ranked ``dict`` table."""
    anchor_re = ("'(?i)<a\\s[^>]*href\\s*=\\s*[\"'']([^\"'']*)[\"'']"
                 "[^>]*>([^<]*)</a>'")
    return f"""{_link_pages_cte()},
anchors AS (
  SELECT url, z[1] AS href, z[2] AS anchor FROM (
    SELECT url, unnest(list_zip(
        regexp_extract_all(html, {anchor_re}, 1),
        regexp_extract_all(html, {anchor_re}, 2)
    )) AS z
    FROM pages
  )
),
resolved AS (
  SELECT lower(trim(anchor)) AS anchor,
         lower(regexp_extract(
           {_resolve_abs_sql('h', 'url')},
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS dst_host
  FROM (SELECT url, anchor, split_part(href, '#', 1) AS h FROM anchors)
),
counts AS (
  SELECT anchor, dst_host, count(*) AS n_links
  FROM resolved
  WHERE anchor <> '' AND dst_host <> ''
  GROUP BY 1, 2
),
dict AS (
  SELECT anchor, dst_host, n_links,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY n_links DESC, dst_host) AS rank
  FROM counts
)"""


def _langid_sql() -> str:
    from quickner_spark.operators.textops import LANG_PROFILES

    profs = ", ".join(
        "('{}', [{}])".format(code, ", ".join(f"'{w}'" for w in words))
        for code, words in sorted(LANG_PROFILES.items()))
    return f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
l(code, words) AS (VALUES {profs}),
s AS (
  SELECT t.doc_id, l.code,
         CAST(len(list_filter(t.toks, x -> list_contains(l.words, x))) AS BIGINT) AS hits
  FROM t CROSS JOIN l
),
b AS (
  SELECT doc_id, code, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, code) AS rn
  FROM s
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN code ELSE 'und' END AS lang_guess,
       hits AS lang_hits
FROM b WHERE rn = 1
"""
