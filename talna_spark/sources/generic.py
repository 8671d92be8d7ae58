"""Generic source adapter: map ANY tabular DataFrame onto the logical
points model ``(metric, ts, value, tags)``.

The events adapter (talna_spark.sources.events) is one hand-tuned
instance of this shape; this module exposes the general mapping so a
user can point the engine at CSV / JSON / JDBC-shaped tables without
writing a module:

    pts = points_from_table(
        df,
        metric=F.lit("sensors.temp"),
        ts=F.col("observed_at").cast("long") * 1_000_000_000,
        value=F.col("temp_c"),
        tags={"site": F.col("site_id").cast("string"),
              "unit": F.lit("c")},
    )
    Database.from_points(spark, pts).avg("sensors.temp", "site")...

Tags with NULL values are dropped from the map (absent tag ≡ the
reference's missing tag, src/agg/builder.rs:120-122). All expressions are
Column expressions — the mapping stays inside whole-stage codegen and
filters on metric/ts push down into the file scan exactly like any
projection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def points_from_table(
    df: DataFrame,
    *,
    metric: Column,
    ts: Column,
    value: Column,
    tags: Mapping[str, Column],
) -> DataFrame:
    """Project a tabular DataFrame to points.

    ``metric``/``ts``/``value``: Column expressions producing
    string / int64-ns / double. ``tags``: tag key -> string Column; NULL
    entries are filtered out of the map per reference semantics.
    """
    entries = []
    for k, col in tags.items():
        entries.extend([F.lit(k), col.cast("string")])
    tag_map = F.map_filter(
        F.create_map(*entries) if entries else F.create_map(),
        lambda _k, v: v.isNotNull(),
    )
    return df.select(
        metric.cast("string").alias("metric"),
        ts.cast("long").alias("ts"),
        value.cast("double").alias("value"),
        tag_map.alias("tags"),
    )


def points_from_csv(
    spark,
    path: str,
    *,
    metric: Column,
    ts: Column,
    value: Column,
    tags: Mapping[str, Column],
    **reader_options,
) -> DataFrame:
    """CSV convenience wrapper (header + schema inference by default)."""
    opts = {"header": "true", "inferSchema": "true", **reader_options}
    df = spark.read.options(**opts).csv(path)
    return points_from_table(df, metric=metric, ts=ts, value=value, tags=tags)


def points_from_json(
    spark,
    path: str,
    *,
    metric: Column,
    ts: Column,
    value: Column,
    tags: Mapping[str, Column],
    **reader_options,
) -> DataFrame:
    """JSON-lines convenience wrapper."""
    df = spark.read.options(**reader_options).json(path)
    return points_from_table(df, metric=metric, ts=ts, value=value, tags=tags)
