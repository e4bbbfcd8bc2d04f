"""Bucketed (pre-partitioned) tables for exchange-free co-located joins.

At 100 TB the mention table is joined on its doc key by several downstream
stages (maximal-mention resolution, triple extraction, link join-back).
Each sort-merge join shuffles both sides every time. Writing the stage
outputs BUCKETED on the join key moves that shuffle to write time, once:
two tables bucketed with the same key and bucket count join with NO
Exchange and (with ``sortBy``) no sort — Spark reads bucket i of each side
straight into the same task.

Spark only honors bucketing through the catalog (``saveAsTable``), not
plain ``.parquet(path)`` — a bare directory has no bucket metadata.
``tests/test_plans.py::test_bucketed_mention_join_has_no_exchange`` pins
the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``buckets`` should be sized so one bucket of the LARGER join side is a
    few hundred MB at target scale (e.g. 28.7M-mention sf: 32 buckets;
    10^11 mentions: ~50k). Both sides of a co-located join must use the
    same ``key`` and ``buckets``.
    """
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
