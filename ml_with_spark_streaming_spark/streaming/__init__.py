"""Structured Streaming layer.

The reference's entire runtime is legacy DStreams: socket text →
``flatMap(json.loads)`` → ``map(split(',', 1))`` → ``foreachRDD``
(PAC/passiveAgressiveModel.py:167-172). Here the same surface is
Structured Streaming: typed sources, a declarative wire parser with a
quarantine column instead of a blanket ``except`` (reference
:136-137), ``foreachBatch`` with a 5 s processing-time trigger for the
incremental-training loop, and fully-declarative watermarked
event-time aggregations for everything expressible without custom
state.
"""

from ml_with_spark_streaming_spark.streaming.wire import parse_wire, WIRE_SCHEMA
from ml_with_spark_streaming_spark.streaming.sources import (
    file_stream,
    rate_stream,
    socket_stream,
)
from ml_with_spark_streaming_spark.streaming.train import StreamingTrainer
from ml_with_spark_streaming_spark.streaming.score import StreamingScorer

__all__ = [
    "parse_wire",
    "WIRE_SCHEMA",
    "socket_stream",
    "file_stream",
    "rate_stream",
    "StreamingTrainer",
    "StreamingScorer",
]
