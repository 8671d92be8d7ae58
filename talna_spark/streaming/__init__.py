"""Structured Streaming extensions (beyond the reference's batch-on-LSM
surface, SURVEY.md §2.2: talna has no streaming machinery — these are the
Spark-native equivalents a continuously-ingesting deployment needs)."""

from talna_spark.streaming.ingest import (
    dedup_stream,
    session_rollup,
    sliding_rollup,
    stream_ingest,
    windowed_rollup,
)
from talna_spark.streaming.stateful import greedy_rollup_stream

__all__ = [
    "dedup_stream",
    "stream_ingest",
    "windowed_rollup",
    "session_rollup",
    "sliding_rollup",
    "greedy_rollup_stream",
]
