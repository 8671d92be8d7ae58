"""Canonical schemas (SURVEY.md §1.4 Spark mapping of the reference's
four LSM partitions, src/db.rs:36-53).

- ``points``: the fact table — one row per data point. Replaces the
  reference's data partition (``series_id ++ !ts -> value`` key codec,
  src/db.rs:99-108); newest-first key negation is unnecessary because
  ordering is declarative in Spark.
- ``series``: the dimension table — one row per distinct {metric, tagset}.
  Replaces smap (src/smap.rs) + tags (src/tag_sets.rs); the inverted index
  (src/tag_index.rs) is not materialized — predicates on the small dim +
  broadcast semi-join give the same pruning (SURVEY.md §1.4).

Timestamps are int64 nanoseconds since the epoch (the reference's u128 ns,
src/lib.rs:108, restricted to the i64 range 1677–2262 — documented).
Values are float64 everywhere (the reference's f32 default is a precision
downgrade we do not copy, src/lib.rs:110-116).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Logical ingest row: what Database.write_batch accepts.
POINTS_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),        # ns since epoch
        StructField("value", DoubleType(), False),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)

# Warehouse fact table (adds derived identity + partition columns).
# ingest_seq: per-batch stamp supporting the reference's last-writer-wins
# key semantics (LSM insert = upsert, src/db.rs:342-343), applied at
# compaction time (see maintenance.compact_facts). Nullable so warehouses
# written before this column existed still read (as null = oldest).
FACT_SCHEMA = StructType(
    [
        StructField("series_id", LongType(), False),  # xxhash64(series_key)
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), False),
        StructField("ingest_seq", LongType(), True),
        StructField("metric", StringType(), False),   # partition column
        StructField("ts_day", StringType(), False),   # partition column (date)
    ]
)

# Warehouse series dimension.
SERIES_SCHEMA = StructType(
    [
        StructField("series_id", LongType(), False),
        StructField("metric", StringType(), False),
        StructField("series_key", StringType(), False),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)

# Query output row (the reference's Bucket {start,end,value,len},
# src/agg/mod.rs:20-43, keyed by the group tag value).
RESULT_SCHEMA = StructType(
    [
        StructField("grp", StringType(), True),
        StructField("start_ts", LongType(), True),
        StructField("end_ts", LongType(), True),
        StructField("value", DoubleType(), True),
        StructField("len", LongType(), True),
    ]
)
