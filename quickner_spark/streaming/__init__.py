from quickner_spark.streaming.annotate_stream import (
    annotate_stream,
    windowed_label_counts,
    streaming_dedup,
    stateful_session_counts,
)

__all__ = ["annotate_stream", "windowed_label_counts", "streaming_dedup",
           "stateful_session_counts"]
