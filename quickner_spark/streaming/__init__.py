from quickner_spark.streaming.annotate_stream import (
    annotate_stream,
    windowed_label_counts,
    streaming_dedup,
    stateful_session_counts,
)
from quickner_spark.streaming.kg_stream import (
    default_batch_writer, host_edges_view, incremental_kg,
    kg_batch_increment)

__all__ = ["annotate_stream", "windowed_label_counts", "streaming_dedup",
           "stateful_session_counts", "incremental_kg", "kg_batch_increment",
           "default_batch_writer", "host_edges_view"]
