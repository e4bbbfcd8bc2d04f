"""Entity co-occurrence statistics (kg/cooccur.py)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from quickner_spark.kg.cooccur import cooccurrence, with_npmi


def _mentions(spark):
    rows = [
        # d1: a, b, b (duplicate mention collapses), c
        ("d1", "a"), ("d1", "b"), ("d1", "b"), ("d1", "c"),
        # d2: a, b
        ("d2", "a"), ("d2", "b"),
        # d3: c only — no pairs
        ("d3", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id string, surface string")


def test_pair_and_marginal_counts(spark):
    got = {(r["e1"], r["e2"]): (r["n_docs"], r["n_e1"], r["n_e2"],
                                r["n_corpus"])
           for r in cooccurrence(_mentions(spark)).collect()}
    assert got == {
        ("a", "b"): (2, 2, 2, 3),
        ("a", "c"): (1, 2, 2, 3),
        ("b", "c"): (1, 2, 2, 3),
    }


def test_min_docs_prunes(spark):
    got = [(r["e1"], r["e2"])
           for r in cooccurrence(_mentions(spark), min_docs=2).collect()]
    assert got == [("a", "b")]


def test_max_per_doc_drops_dense_docs(spark):
    # d1 has 3 distinct entities; cap 2 removes it before pair expansion
    got = {(r["e1"], r["e2"]): r["n_docs"]
           for r in cooccurrence(_mentions(spark),
                                 max_per_doc=2).collect()}
    assert got == {("a", "b"): 1}
    # and the corpus count excludes the dropped doc? No — d3 (1 entity)
    # stays; d1 is dropped, so n_corpus = 2
    r = cooccurrence(_mentions(spark), max_per_doc=2).head()
    assert r["n_corpus"] == 2


def test_npmi_values(spark):
    rows = {(r["e1"], r["e2"]): r
            for r in with_npmi(cooccurrence(_mentions(spark))).collect()}
    ab = rows[("a", "b")]
    # p12 = 2/3, p1 = p2 = 2/3 -> pmi = ln((2/3) / (4/9)) = ln(3/2)
    assert math.isclose(ab["pmi"], math.log(1.5), rel_tol=1e-12)
    assert math.isclose(ab["npmi"], math.log(1.5) / -math.log(2 / 3),
                        rel_tol=1e-12)
    assert -1.0 <= ab["npmi"] <= 1.0


def test_npmi_perfect_cooccurrence_is_one(spark):
    m = spark.createDataFrame([Row(doc_id="d", surface="x"),
                               Row(doc_id="d", surface="y")])
    r = with_npmi(cooccurrence(m)).head()
    assert r["npmi"] == 1.0


def test_scoped_cache_released(spark):
    """cooccurrence caches the deduped projection (referenced 4x);
    release() must leave no persistent RDDs behind."""
    from quickner_spark.operators.caching import release

    spark.catalog.clearCache()
    sc = spark.sparkContext._jsc.sc()
    base = sc.getPersistentRDDs().size()
    out = cooccurrence(_mentions(spark))
    out.count()
    release(out)
    assert sc.getPersistentRDDs().size() == base
