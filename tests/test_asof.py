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
