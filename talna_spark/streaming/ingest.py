"""Streaming ingest + windowed pre-aggregation.

The reference ingests point-at-a-time into an LSM (src/db.rs:319-350);
the Spark-native equivalent is micro-batched Structured Streaming:

- :func:`stream_ingest` — readStream source -> ``foreachBatch`` running the
  exact batch ingest (talna_spark.ingest.write_batch), so streaming and
  batch writes share one code path and one warehouse layout. Out-of-order
  points need no special handling (they land in their (metric, ts_day)
  partition, same as the reference's insert-at-key-position,
  src/db.rs:342-343).
- :func:`windowed_rollup` — event-time tumbling-window aggregation with a
  watermark: the streaming analog of the aligned bucketizer (B_al), with
  late data handled by the watermark instead of talna's
  visible-on-next-query semantics. Output schema matches the batch result
  (grp, start_ts, end_ts, value, len) so a rollup sink can serve the same
  queries pre-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from talna_spark.aggregate import _value_agg


def stream_ingest(points_stream: DataFrame, warehouse_path: str, checkpoint: str):
    """Start a streaming query appending (metric, ts, value, tags) rows to
    the warehouse via the batch ingest path. Returns the StreamingQuery."""
    from talna_spark.ingest import write_batch

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_batch(batch_df, warehouse_path)

    return (
        points_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def dedup_stream(
    points_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once-ify an at-least-once point stream: drop re-delivered
    duplicates of the same logical point (series identity + timestamp)
    arriving within the watermark horizon — the standard front door for
    Kafka-style sources whose producers retry. Chain before
    :func:`stream_ingest`/rollups.

    State shape: ``dropDuplicatesWithinWatermark`` keeps one (series_id,
    ts) key per point inside the horizon and expires it with the
    watermark — bounded by in-horizon point cardinality, the same bound
    the windowed rollups already carry. Duplicate points from different
    BATCH generations (beyond the horizon) remain the warehouse
    compaction's last-writer-wins job, exactly like batch ingest.
    """
    from talna_spark.ingest import with_series_identity

    evt = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        with_series_identity(points_stream)
        .withColumn("_evt", evt)
        .withWatermark("_evt", watermark)
        .dropDuplicatesWithinWatermark(["series_id", "ts"])
        .select("metric", "ts", "value", "tags")
    )


def _windowed(
    points_stream: DataFrame,
    group_by: str,
    kind: str,
    window_col,
    watermark: str,
) -> DataFrame:
    """Shared event-time windowed aggregation scaffold (tumbling, sliding,
    and session rollups differ only in the window column)."""
    grp = F.col("tags").getItem(group_by)
    evt = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        points_stream.withColumn("_evt", evt)
        .filter(grp.isNotNull())
        .withWatermark("_evt", watermark)
        .groupBy(grp.alias("grp"), window_col)
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            _value_agg(kind).alias("value"),
            F.count(F.lit(1)).alias("len"),
        )
    )


def windowed_rollup(
    points_stream: DataFrame,
    group_by: str,
    kind: str = "avg",
    width_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window streaming aggregation keyed by a tag.

    Event time is derived from the int64-ns ``ts`` column. The watermark
    bounds state: buckets older than it are finalized and late points
    beyond it are dropped (documented deviation from the reference, which
    simply makes late writes visible to later queries — exactly what the
    batch path here does too; the rollup is an *additional* materialization).
    """
    win = F.window("_evt", f"{width_seconds} seconds")
    return _windowed(points_stream, group_by, kind, win, watermark).select(
        "grp", "start_ts", "end_ts", "value", "len"
    )


def sliding_rollup(
    points_stream: DataFrame,
    group_by: str,
    kind: str = "avg",
    width_seconds: int = 120,
    slide_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Sliding (hopping) window streaming aggregation keyed by a tag — the
    streaming counterpart of the batch ``QueryBuilder.sliding`` extension.
    Spark's built-in ``window(evt, width, slide)`` assigns each point to
    its ``width/slide`` overlapping windows; state is bounded by the
    watermark. Output adds ``win_start`` (epoch ns of the window edge)
    alongside the observed start/end, matching the batch sliding schema.
    """
    win = F.window(
        "_evt", f"{width_seconds} seconds", f"{slide_seconds} seconds"
    )
    return _windowed(points_stream, group_by, kind, win, watermark).select(
        "grp",
        (F.unix_micros(F.col("window.start")) * F.lit(1000)).alias("win_start"),
        "start_ts",
        "end_ts",
        "value",
        "len",
    )


def session_rollup(
    points_stream: DataFrame,
    group_by: str,
    kind: str = "avg",
    gap_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Session-window streaming aggregation keyed by a tag.

    A bucket stays open while successive points for a group arrive within
    ``gap_seconds`` of each other and closes after a quiet gap — the
    event-time analog of the reference's greedy data-anchored bucketizer
    (O27, src/agg/stream.rs:60-97), which likewise anchors on arriving data
    and closes a bucket once the next point falls outside the width. The
    semantics differ at the edges (sessions extend while points keep
    coming; the greedy bucket is capped at ``width`` from its anchor), so
    this is the streaming *cousin*, not an oracle-equivalent — batch greedy
    mode remains the faithful implementation.

    State is bounded by the watermark (session windows require one in
    append mode); output schema matches the batch result
    (grp, start_ts, end_ts, value, len).
    """
    win = F.session_window("_evt", f"{gap_seconds} seconds")
    return _windowed(points_stream, group_by, kind, win, watermark).select(
        "grp", "start_ts", "end_ts", "value", "len"
    )
