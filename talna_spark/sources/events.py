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
    # The driver testdata's ts column has shipped as BOTH parquet
    # TIMESTAMP(NANOS) (rounds 1-2; nanosAsLong reads it as int64 ns) and
    # plain timestamp[us] (round 3+; Spark reads TIMESTAMP_NTZ). Sniff the
    # decoded type and normalize to int64 epoch ns either way, with the
    # exact value DuckDB's epoch_ns(ts) produces on the same file.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # flag removed in a future Spark: only NANOS-era testdata needs it
        pass
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
    ts_type = ev.schema["ts"].dataType.simpleString()
    if ts_type == "timestamp_ntz":
        # Wall-clock diff from the NTZ epoch is timezone-free arithmetic —
        # identical to DuckDB's epoch_ns on the naive timestamp no matter
        # what spark.sql.session.timeZone is (the driver's session is not
        # ours to configure).
        ts_ns = (
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            * 1000
        ).cast("long")
    elif ts_type == "timestamp":
        ts_ns = (F.unix_micros(F.col("ts")) * 1000).cast("long")
    else:  # int64 ns via nanosAsLong, truncated to µs to match DuckDB
        ts_ns = F.expr("(ts div 1000) * 1000").cast("long")
    out = cache[key] = ev.select(
        F.concat(F.lit("app."), F.lower("event_type")).alias("metric"),
        ts_ns.alias("ts"),
        # raw (pre-conversion) ts under the pushdown convention: predicates
        # on the derived `ts` cannot reach the parquet scan, but `_raw_ts`
        # is a plain alias of the stored column (timestamp branches) or a
        # no-op cast (int64 branch), so time bounds re-expressed on it in
        # the stored type push down to row-group skipping (see
        # ViewBackend.scan, which sniffs this column's type).
        (
            F.col("ts").alias("_raw_ts")
            if ts_type in ("timestamp", "timestamp_ntz")
            else F.col("ts").cast("long").alias("_raw_ts")
        ),
        F.col("value").cast("double").alias("value"),
        tags.alias("tags"),
    )
    return out
