"""As-of join (extension): align each left point with the most recent
right point at or before its timestamp — the canonical time-series
enrichment join (market data, metric correlation). Absent in the
reference (SURVEY.md §2.2 "Joins: none"); named by the project brief as a
first-class custom operator.

Spark has no ASOF JOIN operator, and the naive formulation (range
inequality join + per-left-row max) explodes quadratically per key. The
scalable shape used here is the union-window trick:

  union both sides tagged by a side bit -> one window per key ordered by
  (ts, side) -> ``last(right_value, ignorenulls)`` carries the latest
  right observation forward onto every left row.

One shuffle on the join key, linear work, no row explosion — the same
plan shape as the rate/increase transforms. Right rows are deduplicated
per (key, ts) first (max value wins, deterministically), so the carried
observation is unique. Ties at equal ts are inclusive: a right point AT
the left timestamp matches (side bit orders right before left).

Skew note: one join key = one window partition; a dominant key serializes
into one task exactly like any per-key window. At scale, salt the key or
pre-bucket time (the union-window trick composes with either).

Oracle: DuckDB's native ASOF JOIN (``ON l.k = r.k AND l.ts >= r.ts``)
verifies the semantics independently — two different algorithms, one
answer.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    tolerance_ns: Optional[int] = None,
) -> DataFrame:
    """Inner as-of join of two keyed point streams.

    ``left``/``right``: DataFrames with columns (key, ts, value). Returns
    (key, ts, value, right_ts, right_value): every left row paired with
    the most recent right row of the same key with ``right.ts <= ts``
    (and ``ts - right_ts <= tolerance_ns`` when given); left rows with no
    admissible right row are dropped (inner semantics — avoids NULL
    floats in results).
    """
    r = (
        right.groupBy("key", "ts")
        .agg(F.max("value").alias("_rv"))
        .select(
            "key",
            "ts",
            F.lit(None).cast("double").alias("_lv"),
            "_rv",
            F.lit(0).alias("_side"),
        )
    )
    l = left.select(
        "key",
        "ts",
        F.col("value").alias("_lv"),
        F.lit(None).cast("double").alias("_rv"),
        F.lit(1).alias("_side"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        l.unionByName(r)
        .withColumn("_rv_last", F.last("_rv", ignorenulls=True).over(w))
        .withColumn(
            "_rts_last",
            F.last(
                F.when(F.col("_side") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
    )
    out = u.filter((F.col("_side") == 1) & F.col("_rv_last").isNotNull())
    if tolerance_ns is not None:
        out = out.filter(
            F.col("ts") - F.col("_rts_last") <= F.lit(int(tolerance_ns))
        )
    return out.select(
        "key",
        "ts",
        F.col("_lv").alias("value"),
        F.col("_rts_last").alias("right_ts"),
        F.col("_rv_last").alias("right_value"),
    )
