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


def _aggregate_facts(facts: DataFrame, w: int) -> DataFrame:
    return (
        facts.groupBy(
            "metric", "ts_day", F.expr(f"ts div {w}").alias("bucket"), "series_id"
        )
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count(F.lit(1)).alias("vcnt"),
        )
    )


def _write_rollup(df: DataFrame, path: str, dynamic: bool) -> None:
    # dynamic=False: full static overwrite (build — drops partitions whose
    # days vanished); dynamic=True: overwrite only the partitions present
    # in df (incremental refresh)
    w = (
        df.select(
            "series_id", "bucket", "start_ts", "end_ts",
            "vsum", "vmin", "vmax", "vcnt", "metric", "ts_day",
        )
        .repartition("metric", "ts_day")
        .sortWithinPartitions("bucket", "series_id")
        .write.mode("overwrite")
        .option("compression", "zstd")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy("metric", "ts_day").parquet(path)


def build_rollup(spark: SparkSession, warehouse_path: str, width_ns: int) -> None:
    """Materialize the width_ns rollup with a full rebuild over the facts.

    Layout is partitioned (metric, ts_day) like the facts so
    :func:`refresh_rollup` can later overwrite ONLY the day partitions an
    append touched (dynamic partition overwrite) — maintenance cost then
    scales with appended data, not table size. Buckets never span days
    when W divides a day (the epoch is day-aligned); for W > 1 day use
    full rebuilds.
    """
    from talna_spark.ingest import read_facts

    w = int(width_ns)
    _write_rollup(
        _aggregate_facts(read_facts(spark, warehouse_path), w),
        rollup_path(warehouse_path, w),
        dynamic=False,
    )
    mark_fresh(warehouse_path, w)
    clear_changelog(warehouse_path)


def refresh_rollup(spark: SparkSession, warehouse_path: str, width_ns: int) -> None:
    """Incremental refresh: re-aggregate only the (metric, ts_day)
    partitions appended since the last build/refresh (per the ingest
    changelog) and dynamically overwrite those rollup partitions.

    Correct for ANY width: rollup rows are grained by (ts_day, bucket), so
    a bucket spanning days exists as per-day fragments that the query-time
    final aggregate re-merges — replacing one day's fragments never
    corrupts a neighboring day's.
    """
    from talna_spark.ingest import read_facts

    w = int(width_ns)
    if not os.path.exists(rollup_path(warehouse_path, w)):
        return build_rollup(spark, warehouse_path, w)
    days = read_changelog(warehouse_path)
    if (FULL_REBUILD, FULL_REBUILD) in days:
        # compaction changed the visible multiset in unknown partitions
        return build_rollup(spark, warehouse_path, w)
    if days:
        facts = read_facts(spark, warehouse_path).filter(
            F.concat_ws("|", "metric", "ts_day").isin(
                [f"{m}|{d}" for m, d in days]
            )
        )
        _write_rollup(
            _aggregate_facts(facts, w), rollup_path(warehouse_path, w), dynamic=True
        )
    mark_fresh(warehouse_path, w)
    clear_changelog(warehouse_path)


# ---------------------------------------------------------- ingest changelog
# write_batch appends the (metric, ts_day) partitions each batch touched;
# refresh_rollup consumes exactly those. Plain line files — tiny, append-only,
# atomic enough for a single-writer maintenance cadence (a transactional
# table format would carry this in its commit log).

FULL_REBUILD = "*"  # changelog sentinel: compaction rewrote unknown partitions


def _changelog_dir(warehouse_path: str) -> str:
    return os.path.join(warehouse_path, "_changelog")


def append_changelog(warehouse_path: str, pairs: list[tuple[str, str]]) -> None:
    """Record touched (metric, ts_day) partitions. No-op while no rollup is
    materialized (nothing consumes the log, so it must not accumulate)."""
    if not _all_rollup_dirs(warehouse_path):
        return
    os.makedirs(_changelog_dir(warehouse_path), exist_ok=True)
    import time

    p = os.path.join(_changelog_dir(warehouse_path), f"batch-{time.time_ns()}.log")
    with open(p, "w") as f:
        for m, d in pairs:
            f.write(f"{m}\t{d}\n")


def read_changelog(warehouse_path: str) -> list[tuple[str, str]]:
    d = _changelog_dir(warehouse_path)
    if not os.path.isdir(d):
        return []
    out = set()
    for name in sorted(os.listdir(d)):
        with open(os.path.join(d, name)) as f:
            for line in f:
                m, day = line.rstrip("\n").split("\t")
                out.add((m, day))
    return sorted(out)


def clear_changelog(warehouse_path: str) -> None:
    """Drop consumed changelog entries once every materialized width is
    fresh again (the log is shared across widths — refresh them together
    in one maintenance pass)."""
    stale = set(_all_rollup_dirs(warehouse_path)) - set(
        available_rollups(warehouse_path)
    )
    if stale:
        return
    d = _changelog_dir(warehouse_path)
    if os.path.isdir(d):
        for name in os.listdir(d):
            os.remove(os.path.join(d, name))


def _all_rollup_dirs(warehouse_path: str) -> list[int]:
    try:
        names = os.listdir(warehouse_path)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1)) for n in names if (m := _DIR_RE.match(n))
    )


def mark_fresh(warehouse_path: str, width_ns: int) -> None:
    with open(os.path.join(rollup_path(warehouse_path, int(width_ns)), "_FRESH"), "w"):
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


def _rollup_schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("series_id", LongType()),
            StructField("bucket", LongType()),
            StructField("start_ts", LongType()),
            StructField("end_ts", LongType()),
            StructField("vsum", DoubleType()),
            StructField("vmin", DoubleType()),
            StructField("vmax", DoubleType()),
            StructField("vcnt", LongType()),
            StructField("metric", StringType()),
            StructField("ts_day", StringType()),
        ]
    )


def read_rollup(
    spark: SparkSession, warehouse_path: str, width_ns: int
) -> DataFrame:
    # explicit schema: skip footer inference across partition directories
    return spark.read.schema(_rollup_schema()).parquet(
        rollup_path(warehouse_path, width_ns)
    )


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
    from talna_spark.timeutil import ns_to_day as _day

    w = int(width_ns)
    r = read_rollup(spark, warehouse_path, w).filter(F.col("metric") == metric)
    if start is not None:
        # bucket bound skips row groups; ts_day bound prunes directories
        r = r.filter(F.col("bucket") >= start // w).filter(
            F.col("ts_day") >= _day(start)
        )
    if end is not None:
        r = r.filter(F.col("bucket") <= end // w).filter(
            F.col("ts_day") <= _day(end)
        )
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
