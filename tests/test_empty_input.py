"""Degenerate-input contract: entry queries tolerate ZERO-row tables.

At 100 TB, empty partitions and all-rows-filtered intermediates are
routine — operators must not assume data exists (driver-side collects of
centroids/gazetteers, np.stack over empty batches, min/max over nothing
are the classic crashes; frame_sample's empty-batch Arrow typing bug was
exactly this class). A full sweep of all 68 entry queries over zero-row
clones of every table passed against their DuckDB oracles (round 5);
this test pins the riskiest representatives so the contract survives
refactors without paying the full-gate cost per CI run.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Representatives of each crash-prone shape: matcher broadcast + Arrow
# kernel (q01), banded-LSH signature build (q14), IVF centroid collect +
# integer Lloyd over no vectors (q24), iterative graph algebra over an
# empty edge table (q42), windowed/lag analytics (q21), pair-counting
# with marginals (q62), and the media synth+decode kernels (q67/q68).
RISKY = ["q01_mentions", "q14_minhash_dedup", "q24_ivf_knn",
         "q42_pagerank", "q21_sessions", "q62_cocitation",
         "q67_image_features", "q68_audio_features"]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import duckdb
    d = tmp_path_factory.mktemp("sf_empty")
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        duckdb.sql(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' "
            f"LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("qname", RISKY)
def test_query_survives_empty_tables(spark, qname, empty_dir):
    entrymod.clear_memo()
    df = entrymod.queries()[qname](spark, empty_dir)
    assert df.count() == 0
    entrymod.clear_memo()
