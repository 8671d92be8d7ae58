"""As-of join semantics (talna_spark.asof): inclusivity, tolerance,
right-side dedup, inner drop of unmatched rows."""

from __future__ import annotations


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts long, value double")


def _run(spark, left, right, **kw):
    from talna_spark.asof import asof_join

    out = asof_join(_df(spark, left), _df(spark, right), **kw)
    return sorted(
        (r["key"], r["ts"], r["value"], r["right_ts"], r["right_value"])
        for r in out.collect()
    )


def test_asof_picks_most_recent_at_or_before(spark):
    left = [("a", 10, 1.0), ("a", 25, 2.0), ("a", 5, 3.0)]
    right = [("a", 8, 100.0), ("a", 20, 200.0)]
    assert _run(spark, left, right) == [
        ("a", 10, 1.0, 8, 100.0),   # 8 <= 10 < 20
        ("a", 25, 2.0, 20, 200.0),  # most recent
        # ts=5: no right row at or before -> dropped (inner)
    ]


def test_asof_equal_ts_is_inclusive(spark):
    assert _run(spark, [("a", 10, 1.0)], [("a", 10, 50.0)]) == [
        ("a", 10, 1.0, 10, 50.0)
    ]


def test_asof_keys_do_not_mix(spark):
    out = _run(spark, [("a", 10, 1.0), ("b", 10, 2.0)], [("a", 5, 9.0)])
    assert out == [("a", 10, 1.0, 5, 9.0)]  # key b has no right rows


def test_asof_tolerance(spark):
    left = [("a", 100, 1.0), ("a", 200, 2.0)]
    right = [("a", 95, 9.0)]
    assert _run(spark, left, right, tolerance_ns=10) == [
        ("a", 100, 1.0, 95, 9.0)  # 200-95 > 10 -> dropped
    ]


def test_asof_right_duplicates_resolve_to_max(spark):
    right = [("a", 5, 1.0), ("a", 5, 7.0)]  # duplicate (key, ts)
    assert _run(spark, [("a", 10, 0.0)], right) == [("a", 10, 0.0, 5, 7.0)]


# ---- two-level (sliced) skew path ---------------------------------------


def test_asof_sliced_matches_single_path(spark):
    # one dominant key spanning many time buckets, including a carry
    # across an EMPTY bucket (right silent for a whole slice): the
    # two-level plan must reproduce the single-window output exactly
    import random

    rng = random.Random(7)
    left = [("hot", i * 7 + rng.randrange(5), float(i)) for i in range(200)]
    right = [
        ("hot", t, float(t))
        for t in range(0, 1400, 13)
        if not 300 <= t < 700  # right goes silent across several buckets
    ] + [("cold", 50, 1.0)]
    single = _run(spark, left, right)
    sliced = _run(spark, left, right, slice_width_ns=100)
    assert sliced == single
    assert len(single) > 150


def test_asof_sliced_tolerance_and_inclusive(spark):
    left = [("a", 100, 1.0), ("a", 200, 2.0), ("a", 95, 3.0)]
    right = [("a", 95, 9.0)]
    assert _run(
        spark, left, right, tolerance_ns=10, slice_width_ns=50
    ) == [
        ("a", 95, 3.0, 95, 9.0),    # equal ts inclusive, same bucket
        ("a", 100, 1.0, 95, 9.0),   # carry across the 50-bucket edge
    ]


def test_asof_sliced_windows_are_bucket_keyed(spark):
    # the point of the skew path: the big window partitions by
    # (key, bucket), so a hot key's rows spread across partitions
    from talna_spark.asof import asof_join

    out = asof_join(
        _df(spark, [("a", 10, 1.0)]),
        _df(spark, [("a", 5, 2.0)]),
        slice_width_ns=100,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(key#" in plan.replace(" ", "") or "_b" in plan
    assert "BatchEvalPython" not in plan


def test_interval_join_bucketized_equals_plain(spark):
    """r6 interval join: the bucketized equality-join plan must return
    exactly the plain per-key join's pairs, including points ON interval
    edges and intervals spanning multiple buckets."""
    from talna_spark.asof import interval_join

    points = spark.createDataFrame(
        [
            ("a", 5, 1.0), ("a", 10, 2.0), ("a", 25, 3.0), ("a", 40, 4.0),
            ("b", 10, 5.0), ("c", 7, 6.0),
        ],
        "key string, ts long, value double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 5, 25, 100.0),    # inclusive both ends; spans buckets
            ("a", 20, 60, 200.0),   # overlaps the first
            ("b", 0, 9, 300.0),     # excludes b's point at 10
            ("c", 7, 7, 400.0),     # degenerate single-instant interval
            ("c", 9, 3, 500.0),     # start > end: dropped
        ],
        "key string, start long, end long, ival double",
    )
    plain = sorted(map(tuple, interval_join(points, intervals).collect()))
    assert ("a", 5, 1.0, 5, 25, 100.0) in plain      # start edge inclusive
    assert ("a", 25, 3.0, 5, 25, 100.0) in plain     # end edge inclusive
    assert ("a", 25, 3.0, 20, 60, 200.0) in plain    # overlapping -> both
    assert ("c", 7, 6.0, 7, 7, 400.0) in plain       # degenerate matches
    assert not any(r[0] == "b" for r in plain)       # 10 not in [0, 9]
    assert not any(r[4] == 3 for r in plain)         # inverted dropped
    for w in (1, 7, 100):  # buckets smaller/comparable/larger than spans
        bucketized = sorted(
            map(tuple, interval_join(points, intervals, bucket_width_ns=w).collect())
        )
        assert bucketized == plain, w


def test_interval_join_bucketized_is_hash_join(spark):
    """The bucketized path must plan an EQUALITY hash join (the scale
    contract) — the plain path degrades to per-key joins only."""
    from talna_spark.asof import interval_join

    points = spark.createDataFrame(
        [("a", 5, 1.0)], "key string, ts long, value double"
    )
    intervals = spark.createDataFrame(
        [("a", 0, 9, 1.0)], "key string, start long, end long, ival double"
    )
    plan = (
        interval_join(points, intervals, bucket_width_ns=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" in plan and "NestedLoop" not in plan
