"""Structured Streaming operators: continuous annotation of a document
stream, watermarked windowed label counts, and streaming exact-dedup.

The reference is batch-only (SURVEY.md §2.8: no streaming in the
reference); these are the engine extensions a continuously-crawled corpus
needs. The annotate stage reuses the exact batch kernel — mapInPandas works
identically on streaming DataFrames, and the broadcast gazetteer is
task-shared the same way — so streaming and batch results are definitionally
consistent.

Scale notes: the stateful operators (windowed counts, dropDuplicates) keep
state bounded via watermarks; dedup state is keyed on a fixed-width digest,
not raw text.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from quickner_spark.operators.annotate import annotate_mentions

__all__ = ["annotate_stream", "windowed_label_counts", "streaming_dedup"]


def annotate_stream(stream_df: DataFrame, entities: Sequence[tuple[str, str]],
                    id_col: str = "doc_id", text_col: str = "text",
                    case_sensitive: bool = False,
                    passthrough_cols: tuple[str, ...] = ()) -> DataFrame:
    """Streaming mentions: identical kernel + schema as the batch operator
    (annotate_mentions is a narrow map, so it is streaming-safe with no
    state and no trigger constraints). Pass the event-time column through
    ``passthrough_cols`` for downstream windowed aggregation — stream-stream
    joins are thereby avoided entirely."""
    return annotate_mentions(stream_df, entities, id_col=id_col,
                             text_col=text_col, case_sensitive=case_sensitive,
                             passthrough_cols=passthrough_cols)


def windowed_label_counts(mentions_with_ts: DataFrame, ts_col: str = "ts",
                          window: str = "10 minutes",
                          watermark: str = "20 minutes") -> DataFrame:
    """Per-label mention counts over event-time windows with late-data
    handling: rows later than the watermark are dropped, state for closed
    windows is evicted."""
    return (mentions_with_ts
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("win"), F.col("label"))
            .agg(F.count("*").alias("n_mentions"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "label", "n_mentions"))


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    ts_col: str = "ts",
                    watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact-dedup: first occurrence of each text digest within
    the watermark horizon survives. State key = md5 digest (fixed width);
    the watermark bounds state size."""
    keyed = stream_df.withColumn("__digest", F.md5(F.col(text_col)))
    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicates(["__digest"])
            .drop("__digest"))
