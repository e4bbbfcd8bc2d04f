from quickner_spark.streaming.annotate_stream import (
    annotate_stream,
    windowed_label_counts,
    streaming_dedup,
)

__all__ = ["annotate_stream", "windowed_label_counts", "streaming_dedup"]
