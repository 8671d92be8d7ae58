"""Map the driver testdata ``events`` table to the logical points model
(FIXTURES.md F8) — the realistic-cardinality corpus for oracle checks.

events(event_id, ts timestamp, user_id, event_type, value, props json-str)
  -> points(metric, ts ns, value double, tags map<string,string>)

  metric = 'app.' || lower(event_type)
  tags   = { user:  cast(user_id as string),
             etype: event_type,
             k:     json props.k (string),
             hi:    'yes' when value > 100 (absent otherwise) }

The conditional ``hi`` tag deliberately creates series that LACK a tag, to
exercise the reference's group-tag drop semantics (src/agg/builder.rs:120-122)
and key-exists wildcards (src/db.rs:1124-1132).

``TAG_SQL`` holds the DuckDB expression for each tag so the oracle SQL is
generated from the very same mapping (never hand-synced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DuckDB-side expression per tag key (over the raw `events` view).
TAG_SQL = {
    "user": "CAST(user_id AS VARCHAR)",
    "etype": "event_type",
    "k": "json_extract_string(props, '$.k')",
    "hi": "CASE WHEN value > 100 THEN 'yes' END",
}

# DuckDB-side metric + timestamp expressions (over the raw `events` view).
METRIC_SQL = "'app.' || lower(event_type)"
TS_SQL = "epoch_ns(ts)"


def points_from_events(
    spark: SparkSession, sf_dir: str, parallelism: int | None = None
) -> DataFrame:
    # The unresolved view is pure (reader + column expressions); rebuilding
    # it costs ~0.35 s of py4j/analysis chatter per query, so cache it on
    # the session. Spark itself caches the file listing for the session, so
    # this adds no staleness beyond what spark.read already has.
    cache = getattr(spark, "_talna_points_cache", None)
    if cache is None:
        cache = {}
        spark._talna_points_cache = cache
    key = (sf_dir, parallelism)
    if key in cache:
        return cache[key]
    # events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    # reader rejects by default; nanosAsLong reads it as int64 ns — exactly
    # our timestamp representation. DuckDB truncates the same column to µs
    # (TIMESTAMP), so we truncate too: epoch_ns(ts) on the oracle side then
    # matches bit-for-bit.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if parallelism:
        # Ingest-only knob: a single-row-group file scans as ONE task, and
        # the JSON/tag projection would run serially above it. Shuffling
        # the RAW rows first puts the projection above the exchange, i.e.
        # parallel. Leave unset for queries — an exchange below the
        # projection would break filter pushdown into the file scan.
        ev = ev.repartition(parallelism)
    tags = F.map_filter(
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("etype"), F.col("event_type"),
            F.lit("k"), F.get_json_object("props", "$.k"),
            F.lit("hi"), F.when(F.col("value") > 100, F.lit("yes")),
        ),
        lambda _k, v: v.isNotNull(),
    )
    out = cache[key] = ev.select(
        F.concat(F.lit("app."), F.lower("event_type")).alias("metric"),
        # int64 ns via nanosAsLong, truncated to µs to match DuckDB
        F.expr("(ts div 1000) * 1000").cast("long").alias("ts"),
        # raw (untruncated) ts under the pushdown convention: predicates on
        # the derived `ts` cannot reach the parquet scan, but `_raw_ts` is a
        # plain alias of the stored column, so widened time bounds on it
        # push down to row-group skipping (see ViewBackend.scan).
        F.col("ts").cast("long").alias("_raw_ts"),
        F.col("value").cast("double").alias("value"),
        tags.alias("tags"),
    )
    return out
