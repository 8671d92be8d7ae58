"""Materialized rollups: pre-aggregated downsamples of the fact table,
with transparent query rewrite.

The reference re-scans raw points for every query (its only acceleration
is the key layout, src/db.rs:99-146). At 100 TB, queries spanning months
must not touch raw points — the standard TSDB answer is downsampled
rollup tables. This module materializes them and the query path rewrites
onto them when (and only when) the rewrite is EXACT:

- a rollup of width W stores, per (series_id, bucket=ts div W):
  sum / min / max / count plus the true min/max raw timestamp. All five
  reference aggregations re-aggregate losslessly from these partials
  (avg = sum/count at finish — the same partial/final split Spark's own
  hash aggregate uses), and bucket start/end (true point timestamps,
  O33) survive via min(start)/max(end).
- a query with aligned mode, granularity G (G % W == 0, or a single
  unbounded bucket), and time bounds that coincide with W-bucket edges
  (start % W == 0; end ≡ W-1 mod W; either may be absent) maps each
  rollup bucket wholly into one result bucket: floor(ts/G) is constant
  across [bW, bW+W) because both grids share the epoch origin.
  Any other query (greedy mode, percentile/rate, unaligned bounds)
  falls back to the raw scan — correctness never depends on the rollup.

Layout: parquet partitioned by metric, sorted by (bucket, series_id)
inside each partition so time-range predicates prune row groups; rows
are one per (series, W-bucket) — typically 100-10000x smaller than raw.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIR_RE = re.compile(r"^rollup_(\d+)$")


def rollup_path(warehouse_path: str, width_ns: int) -> str:
    return os.path.join(warehouse_path, f"rollup_{int(width_ns)}")


def available_rollups(warehouse_path: str) -> list[int]:
    """FRESH materialized rollup widths (ns), finest first.

    A rollup is consulted only while its ``_FRESH`` marker exists; ingest
    removes the marker (see ingest.write_batch), so a rollup built before
    an append can never serve queries that would miss the new points.
    """
    try:
        names = os.listdir(warehouse_path)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = _DIR_RE.match(n)
        if m and os.path.exists(os.path.join(warehouse_path, n, "_FRESH")):
            out.append(int(m.group(1)))
    return sorted(out)


def build_rollup(spark: SparkSession, warehouse_path: str, width_ns: int) -> None:
    """Materialize/refresh the width_ns rollup from the raw fact table.

    One distributed aggregate over the facts; at scale this is an
    incremental job (aggregate only new ts_day partitions and merge), but
    the full rebuild keeps the same shape.
    """
    from talna_spark.ingest import read_facts

    w = int(width_ns)
    facts = read_facts(spark, warehouse_path)
    (
        facts.groupBy(
            "metric", F.expr(f"ts div {w}").alias("bucket"), "series_id"
        )
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count(F.lit(1)).alias("vcnt"),
        )
        .repartition("metric")
        .sortWithinPartitions("bucket", "series_id")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("metric")
        .parquet(rollup_path(warehouse_path, w))
    )
    with open(os.path.join(rollup_path(warehouse_path, w), "_FRESH"), "w"):
        pass


def pick_rollup(
    warehouse_path: str,
    kind: str,
    mode: str,
    granularity: Optional[int],
    start: Optional[int],
    end: Optional[int],
) -> Optional[int]:
    """The coarsest materialized width the query can use exactly, or None.

    Exactness conditions (see module docstring): aligned mode; one of the
    five decomposable aggregations; G a multiple of W (or single unbounded
    bucket); bounds on W-bucket edges.
    """
    if mode != "aligned" or kind not in ("avg", "sum", "min", "max", "count"):
        return None
    best = None
    for w in available_rollups(warehouse_path):
        if granularity is not None and granularity % w != 0:
            continue
        if start is not None and start % w != 0:
            continue
        if end is not None and (end + 1) % w != 0:
            continue
        best = w  # sorted ascending: the last admissible is the coarsest
    return best


def read_rollup(
    spark: SparkSession, warehouse_path: str, width_ns: int
) -> DataFrame:
    return spark.read.parquet(rollup_path(warehouse_path, width_ns))


def rollup_scan(
    spark: SparkSession,
    warehouse_path: str,
    width_ns: int,
    metric: str,
    matched_series: DataFrame,
    start: Optional[int],
    end: Optional[int],
) -> DataFrame:
    """Partial-aggregate scan: rollup rows for the matched series within
    bounds, with tags attached (broadcast, same shape as the raw path)."""
    w = int(width_ns)
    r = read_rollup(spark, warehouse_path, w).filter(F.col("metric") == metric)
    if start is not None:
        r = r.filter(F.col("bucket") >= start // w)
    if end is not None:
        r = r.filter(F.col("bucket") <= end // w)
    return r.join(
        F.broadcast(matched_series.select("series_id", "tags")),
        "series_id",
        "inner",
    )


def rollup_aggregate(
    scan: DataFrame, group_col, kind: str, width_ns: int, granularity: Optional[int]
) -> DataFrame:
    """Final aggregation over rollup partials -> the standard result shape
    (grp, start_ts, end_ts, value, len)."""
    keys = [group_col.alias("grp")]
    if granularity is not None:
        # every W-bucket maps wholly into one G-bucket (G % W == 0)
        keys.append(
            F.expr(f"(bucket * {int(width_ns)}) div {int(granularity)}").alias(
                "_bucket"
            )
        )
    finals = {
        "avg": F.sum("vsum") / F.sum("vcnt"),
        "sum": F.sum("vsum"),
        "min": F.min("vmin"),
        "max": F.max("vmax"),
        "count": F.sum("vcnt").cast("double"),
    }
    out = scan.groupBy(*keys).agg(
        F.min("start_ts").alias("start_ts"),
        F.max("end_ts").alias("end_ts"),
        finals[kind].alias("value"),
        F.sum("vcnt").alias("len"),
    )
    return out.select("grp", "start_ts", "end_ts", "value", "len")
