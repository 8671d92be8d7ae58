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
into one task exactly like any per-key window. ``slice_width_ns``
activates the two-level skew path: windows run per (key, time bucket) —
parallel across buckets of the same key — and a tiny per-key pass over
bucket SUMMARIES (one row per bucket) computes each bucket's carry-in
(the last right observation of all earlier buckets), stitched back with
a coalesce. Identical output, no dominant-key single task.

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
    slice_width_ns: Optional[int] = None,
) -> DataFrame:
    """Inner as-of join of two keyed point streams.

    ``left``/``right``: DataFrames with columns (key, ts, value). Returns
    (key, ts, value, right_ts, right_value): every left row paired with
    the most recent right row of the same key with ``right.ts <= ts``
    (and ``ts - right_ts <= tolerance_ns`` when given); left rows with no
    admissible right row are dropped (inner semantics — avoids NULL
    floats in results). ``slice_width_ns`` switches to the skew-safe
    two-level plan (see module docstring) — same results, windows keyed
    by (key, ts div slice_width_ns) instead of the bare key.
    """
    if slice_width_ns is not None:
        return _asof_join_sliced(left, right, tolerance_ns, int(slice_width_ns))
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


def _asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    tolerance_ns: Optional[int],
    slice_width: int,
) -> DataFrame:
    """Two-level as-of join: per-(key, time-bucket) windows + a per-key
    carry-in stitch over one summary row per bucket. A dominant key's
    work spreads over its time buckets instead of one task; the only
    per-key sequential structure left is the summary window, whose row
    count is bounded by the time range / slice width."""
    if slice_width <= 0:
        raise ValueError("slice_width_ns must be positive")
    bucket = lambda c: F.expr(f"{c} div {slice_width}")  # noqa: E731
    # global right dedup per (key, ts) — hash agg, skew-tolerant
    r0 = right.groupBy("key", "ts").agg(F.max("value").alias("_rv"))
    r = r0.select(
        "key", "ts", bucket("ts").alias("_b"),
        F.lit(None).cast("double").alias("_lv"), "_rv",
        F.lit(0).alias("_side"),
    )
    l = left.select(
        "key", "ts", bucket("ts").alias("_b"),
        F.col("value").alias("_lv"),
        F.lit(None).cast("double").alias("_rv"),
        F.lit(1).alias("_side"),
    )
    # within-bucket carry: same union-window trick, partitioned by
    # (key, bucket) — parallel across a hot key's buckets
    wb = (
        Window.partitionBy("key", "_b")
        .orderBy("ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        l.unionByName(r)
        .withColumn("_rv_in", F.last("_rv", ignorenulls=True).over(wb))
        .withColumn(
            "_rts_in",
            F.last(
                F.when(F.col("_side") == 0, F.col("ts")), ignorenulls=True
            ).over(wb),
        )
    )
    # bucket summaries: the newest right observation per (key, bucket) —
    # one row per bucket; the per-key ordered pass over THESE is tiny
    summ = r0.groupBy("key", bucket("ts").alias("_b")).agg(
        F.max("ts").alias("_srts"),
        F.max_by("_rv", F.struct("ts")).alias("_srv"),
    )
    wk = (
        Window.partitionBy("key")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # left rows need the carry of their OWN bucket even when the bucket
    # has no right rows at all — build the carry frame over the union of
    # buckets observed on either side, then left-join it in
    all_buckets = (
        l.select("key", "_b").distinct()
        .unionByName(summ.select("key", "_b"))
        .distinct()
    )
    carry_all = (
        all_buckets.join(summ.select("key", "_b", "_srts", "_srv"),
                         ["key", "_b"], "left")
        .select(
            "key", "_b",
            F.last("_srts", ignorenulls=True).over(wk).alias("_c_rts"),
            F.last("_srv", ignorenulls=True).over(wk).alias("_c_rv"),
        )
    )
    out = (
        u.filter(F.col("_side") == 1)
        .join(carry_all, ["key", "_b"], "left")
        .withColumn("_rv_fin", F.coalesce("_rv_in", "_c_rv"))
        .withColumn("_rts_fin", F.coalesce("_rts_in", "_c_rts"))
        .filter(F.col("_rv_fin").isNotNull())
    )
    if tolerance_ns is not None:
        out = out.filter(
            F.col("ts") - F.col("_rts_fin") <= F.lit(int(tolerance_ns))
        )
    return out.select(
        "key",
        "ts",
        F.col("_lv").alias("value"),
        F.col("_rts_fin").alias("right_ts"),
        F.col("_rv_fin").alias("right_value"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_width_ns: Optional[int] = None,
) -> DataFrame:
    """Interval (range-containment) join — the other canonical
    time-series join beside as-of: every (key, ts, value) point paired
    with every (key, start, end, ival) interval of the same key that
    CONTAINS it (inclusive on both ends). Returns (key, ts, value,
    start, end, ival); points in no interval are dropped (inner).

    Scale shape: the naive formulation is an inequality join — Catalyst
    can only nested-loop it, and a per-key equality join degrades to a
    per-key cross product under skew. With ``bucket_width_ns`` set, each
    interval EXPLODES into the coarse ts-buckets it overlaps
    (amplification = len/width + 1 rows — pick a width near the typical
    interval length) and the join becomes an EQUALITY hash join on
    (key, bucket) followed by an exact containment filter; a point
    lives in exactly one bucket, so no pair is emitted twice and no
    dedup pass is needed. Without a width, a plain per-key hash join +
    filter runs (fine while no key dominates) — both paths are tested
    identical."""
    p = points.select("key", "ts", "value")
    iv = intervals.select("key", "start", "end", "ival").filter(
        F.col("start") <= F.col("end")
    )
    if bucket_width_ns is None:
        out = p.join(iv, "key").filter(
            (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
        )
    else:
        w = int(bucket_width_ns)
        if w <= 0:
            raise ValueError("bucket_width_ns must be positive")
        ivb = iv.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.expr(f"start div {w}"), F.expr(f"end div {w}")
                )
            ),
        )
        pb = p.withColumn("_b", F.expr(f"ts div {w}"))
        out = pb.join(ivb, ["key", "_b"]).filter(
            (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
        ).drop("_b")
    return out.select("key", "ts", "value", "start", "end", "ival")
