"""Dedup-family + text-analytics operator tests on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickner_spark.operators import textops as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_on_duplicated_input(spark, docs):
    dups = tx.exact_dup_groups(docs.unionAll(docs))
    assert dups.count() == docs.count()
    row = dups.first()
    assert row["n_copies"] == 2


def test_token_stats_reconcile(docs):
    st = tx.token_stats(docs)
    row = (st.join(docs, "doc_id")
           .select("n_tokens", "n_chars_text", "n_chars").first())
    assert row["n_chars_text"] == row["n_chars"]
    assert row["n_tokens"] >= 1


def test_jaccard_pairs_symmetric_bounds(docs):
    pairs = tx.jaccard_pairs(docs, n=3, threshold_pct=80).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["shared"] <= min(r["n_a"], r["n_b"])


def test_minhash_dedup_recall_vs_exact(docs):
    exact = {(r["doc_a"], r["doc_b"])
             for r in tx.jaccard_pairs(docs, 3, 80).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in tx.minhash_dedup(docs, 3, num_hashes=64, bands=16,
                                     threshold_pct=80).collect()}
    assert lsh <= exact  # exact-verified: no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, (recall, len(lsh), len(exact))


def test_doc_freq_cap_drops_common_shingles(docs):
    capped = tx.jaccard_pairs(docs, n=1, threshold_pct=10, doc_freq_cap=5)
    uncapped = tx.jaccard_pairs(docs, n=1, threshold_pct=10)
    # unigram shingles are all ultra-common: the cap removes everything
    assert capped.count() < uncapped.count()


def test_simhash_similar_docs_close(docs):
    sim = tx.simhash64(docs)
    pairs = tx.jaccard_pairs(docs, 3, 80)
    joined = (pairs
              .join(sim.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("simhash", "h_a"), "doc_a")
              .join(sim.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("simhash", "h_b"), "doc_b"))
    ham = joined.select(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
                        .alias("d")).collect()
    assert ham, "no near-dup pairs to compare"
    avg = sum(r["d"] for r in ham) / len(ham)
    assert avg <= 8, avg  # near-dups should be hamming-close


def test_simhash_matches_explode_groupby_reference(docs):
    """Differential pin: the in-row aggregate form is row-identical to the
    naive explode-to-(doc, token) + groupBy shape it replaced (the old
    implementation, kept here as the reference)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    h = tok.select("doc_id", F.xxhash64("t").alias("h"))
    one = F.lit(1).cast("long")
    bit_cols = [
        F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    agg = h.groupBy("doc_id").agg(*bit_cols)
    ref_sim = F.lit(0).cast("long")
    for b in range(64):
        ref_sim = ref_sim + F.when(F.col(f"b{b}") > 0, F.shiftleft(one, b)) \
            .otherwise(F.lit(0).cast("long"))
    ref = {r["doc_id"]: r["simhash"]
           for r in agg.select("doc_id", ref_sim.alias("simhash")).collect()}
    got = {r["doc_id"]: r["simhash"] for r in tx.simhash64(docs).collect()}
    assert got == ref


def test_simhash_plan_has_no_exchange(docs):
    plan = tx.simhash64(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fingerprint_shape(docs):
    fp = tx.fingerprint(docs).first()
    assert len(fp["fingerprint"]) >= 1


def test_dup_clusters_transitive_and_singletons(spark):
    """A~B and B~C must land in ONE cluster (transitive closure, not
    pairwise), keep marks exactly the min-id representative, and docs with
    no near-dup partner are singleton keepers."""
    base = " ".join(f"w{i}" for i in range(30))
    rows = [
        (1, base),                              # A
        (2, base + " extra"),                   # B ~ A
        (3, base + " extra more"),              # C ~ B (and A)
        (9, " ".join(f"z{i}" for i in range(30))),  # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in tx.dup_clusters(df, n=3, threshold_pct=80).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[9] == (9, True)
    assert len(got) == 4


def test_repeated_blocks_detects_planted_template(spark):
    base = "tok%d " * 16
    boiler = " ".join(f"b{i}" for i in range(16))
    rows = [(1, boiler + " " + " ".join(f"x{i}" for i in range(16))),
            (2, boiler + " " + " ".join(f"y{i}" for i in range(16))),
            (3, " ".join(f"z{i}" for i in range(16)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.repeated_blocks(df, block=16, min_count=2).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["first_doc"] == 1


def test_jaccard_prefix_equals_full_join(docs):
    for pct in (60, 80, 95):
        full = sorted(map(tuple, tx.jaccard_pairs(docs, 3, pct).collect()))
        pref = sorted(map(tuple, tx.jaccard_pairs_prefix(docs, 3, pct).collect()))
        assert pref == full, pct


def test_scoped_caches_are_releasable(spark, docs):
    """Operators that cache intermediates must expose them via the
    track/release contract so a long-lived session does not accumulate
    executor storage: after release() (or the operators' internal release,
    for dup_clusters/canonicalize) none of the operator's OWN persistent
    RDDs remain. Compared as an id-SET SUBSET, not a count: the baseline
    can include leftover localCheckpoint RDDs from earlier tests that
    Spark's async ContextCleaner unpersists whenever their references are
    GC'd — a count baseline flakes when that happens mid-test."""
    from quickner_spark.operators.caching import release
    from quickner_spark.operators import textops as tx

    spark.catalog.clearCache()  # drop cache entries left by earlier tests
    docs.count()  # re-materialize the fixture's own cache before baselining
    jsc = spark.sparkContext._jsc

    def live_ids():
        return set(jsc.getPersistentRDDs().keySet().toArray())

    base_ids = live_ids()

    out = tx.minhash_dedup(docs)
    out.count()
    release(out)
    assert live_ids() <= base_ids

    out = tx.jaccard_pairs_prefix(docs)
    out.count()
    release(out)
    assert live_ids() <= base_ids

    # dup_clusters / canonicalize release their own intermediates
    tx.dup_clusters(docs).count()
    assert live_ids() <= base_ids

    from quickner_spark.kg.canonicalize import canonicalize_aliases
    al = spark.createDataFrame([("acme inc",), ("acme incorporated",),
                                ("zeta corp",)], "alias string")
    canonicalize_aliases(al).count()
    assert live_ids() <= base_ids
