"""Scoped-cache contract for plan-building operators.

Several operators (``jaccard_pairs``, ``jaccard_pairs_prefix``,
``minhash_dedup``, the canonicalization block join) cache an intermediate
(shingle/hash sets) that the returned plan references two or three times;
the cache materializes at the CALLER's first action, so the operator
cannot unpersist it before returning without throwing the benefit away.
Spark's CacheManager keys cached plans by logical plan and never frees
them on GC, so on a long-lived shared session each call would otherwise
leak executor storage.

The contract: operators attach their cached dependencies to the returned
DataFrame with :func:`track`; callers call :func:`release` once they have
consumed the result (collected, written, or counted for the last time).
``release`` is a no-op on DataFrames with nothing tracked, so harnesses
can call it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["track", "release"]

_ATTR = "_quickner_cached_deps"


def track(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` (already ``.cache()``d) as dependencies of
    ``out`` so a later :func:`release(out)` can unpersist them."""
    setattr(out, _ATTR, list(cached))
    return out


def release(df: DataFrame) -> None:
    """Unpersist every cached dependency recorded on ``df`` (no-op if
    none). Safe after the caller's final action on ``df``; a subsequent
    action would silently recompute rather than fail."""
    for dep in getattr(df, _ATTR, []):
        dep.unpersist(blocking=False)
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])
