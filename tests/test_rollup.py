"""Materialized rollups: rewritten queries must equal the raw-scan
results for every admissible (kind, granularity, bounds) combination, and
inadmissible queries must silently fall back to raw."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from talna_spark.database import Database
from talna_spark.duration import Duration
from talna_spark.rollup import available_rollups, pick_rollup
from talna_spark.sources.events import points_from_events

MIN = Duration.MINUTE
HOUR = Duration.HOUR


@pytest.fixture(scope="module")
def wh(spark):
    d = tempfile.mkdtemp(prefix="talna_rollup_wh_")
    db = Database.open(spark, d)
    db.write_batch(points_from_events(spark, "/root/testdata/sf0.001"))
    db.build_rollup(MIN)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _key(df):
    return sorted(
        (r["grp"], r["start_ts"], r["end_ts"], round(r["value"], 6), r["len"])
        for r in df.collect()
    )


# 2024-01-10T00:00 and end at a minute-edge minus 1ns (inclusive-end form)
T0 = 1_704_844_800 * 10**9
T1 = 1_705_708_800 * 10**9 - 1


@pytest.mark.parametrize("kind", ["avg", "sum", "min", "max", "count"])
def test_rollup_equals_raw_all_kinds(spark, wh, kind):
    db = Database.open(spark, wh)
    b = lambda d: getattr(d, kind)("app.purchase", "user").granularity(HOUR)
    assert pick_rollup(wh, kind, "aligned", HOUR, None, None) == MIN
    with_r = _key(b(db).to_df())
    # authoritative raw comparison: rebuild the plan with rollups hidden
    os.rename(f"{wh}/rollup_{MIN}/_FRESH", f"{wh}/rollup_{MIN}/_FRESH.bak")
    try:
        without = _key(b(db).to_df())
    finally:
        os.rename(f"{wh}/rollup_{MIN}/_FRESH.bak", f"{wh}/rollup_{MIN}/_FRESH")
    assert with_r == without


def test_rollup_with_aligned_bounds(spark, wh):
    db = Database.open(spark, wh)
    q = lambda: db.count("app.click", "user").start(T0).end(T1).granularity(HOUR)
    assert pick_rollup(wh, "count", "aligned", HOUR, T0, T1) == MIN
    with_r = _key(q().to_df())
    os.rename(f"{wh}/rollup_{MIN}/_FRESH", f"{wh}/rollup_{MIN}/_FRESH.bak")
    try:
        without = _key(q().to_df())
    finally:
        os.rename(f"{wh}/rollup_{MIN}/_FRESH.bak", f"{wh}/rollup_{MIN}/_FRESH")
    assert with_r == without


def test_rollup_single_unbounded_bucket(spark, wh):
    db = Database.open(spark, wh)
    assert pick_rollup(wh, "sum", "aligned", None, None, None) == MIN
    with_r = _key(db.sum("app.view", "user").granularity(None).to_df())
    os.rename(f"{wh}/rollup_{MIN}/_FRESH", f"{wh}/rollup_{MIN}/_FRESH.bak")
    try:
        without = _key(db.sum("app.view", "user").granularity(None).to_df())
    finally:
        os.rename(f"{wh}/rollup_{MIN}/_FRESH.bak", f"{wh}/rollup_{MIN}/_FRESH")
    assert with_r == without


def test_inadmissible_queries_skip_rollup(wh):
    # unaligned granularity / bounds, greedy mode, non-decomposable kinds
    assert pick_rollup(wh, "avg", "aligned", MIN + 7, None, None) is None
    assert pick_rollup(wh, "avg", "aligned", HOUR, T0 + 5, None) is None
    assert pick_rollup(wh, "avg", "aligned", HOUR, None, T1 - 5) is None
    assert pick_rollup(wh, "avg", "greedy", HOUR, None, None) is None
    assert pick_rollup(wh, "p95", "aligned", HOUR, None, None) is None
    assert pick_rollup(wh, "rate", "aligned", HOUR, None, None) is None


def test_append_invalidates_rollup(spark, wh):
    d = tempfile.mkdtemp(prefix="talna_rollup_inv_")
    try:
        db = Database.open(spark, d)
        pts = points_from_events(spark, "/root/testdata/sf0.001")
        db.write_batch(pts)
        db.build_rollup(MIN)
        assert available_rollups(d) == [MIN]
        db.write_batch(pts.limit(10))
        assert available_rollups(d) == []  # stale rollup must not serve
        # and the query (now raw) still sees ALL points
        n = sum(
            b.len
            for v in db.count("app.purchase", "user").collect().values()
            for b in v
        )
        db2 = Database.open(spark, d)
        assert n > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_refresh_equals_full_rebuild(spark):
    """Append -> refresh_rollup re-aggregates only the touched days, and
    the result is identical to a from-scratch rebuild."""
    from talna_spark.rollup import read_changelog, read_rollup

    d = tempfile.mkdtemp(prefix="talna_rollup_incr_")
    try:
        pts = points_from_events(spark, "/root/testdata/sf0.001")
        db = Database.open(spark, d)
        # first 2024-01-05 half, then the rest as the "append"
        cut = (1_704_067_200 + 4 * 86_400) * 10**9
        from pyspark.sql import functions as F

        db.write_batch(pts.filter(F.col("ts") < cut))
        db.build_rollup(MIN)
        db2 = Database.open(spark, d)
        db2.write_batch(pts.filter(F.col("ts") >= cut))
        log = read_changelog(d)
        assert log, "append must record touched partitions"
        assert all(day >= "2024-01-05" for _m, day in log)
        db2.refresh_rollup(MIN)
        assert read_changelog(d) == []  # consumed
        incr = sorted(
            map(tuple, read_rollup(spark, d, MIN).collect())
        )
        db2.build_rollup(MIN)  # authoritative full rebuild
        full = sorted(map(tuple, read_rollup(spark, d, MIN).collect()))
        assert incr == full
        # and the rollup-served query equals the raw-path answer
        db3 = Database.open(spark, d)
        db3.build_rollup(MIN)
        q = lambda: db3.avg("app.purchase", "user").granularity(HOUR)
        with_r = _key(q().to_df())
        os.rename(f"{d}/rollup_{MIN}/_FRESH", f"{d}/rollup_{MIN}/_FRESH.bak")
        try:
            assert _key(q().to_df()) == with_r
        finally:
            os.rename(f"{d}/rollup_{MIN}/_FRESH.bak", f"{d}/rollup_{MIN}/_FRESH")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compaction_forces_full_rebuild_sentinel(spark):
    from talna_spark.rollup import FULL_REBUILD, available_rollups, read_changelog

    d = tempfile.mkdtemp(prefix="talna_rollup_sentinel_")
    try:
        db = Database.open(spark, d)
        db.write_batch(points_from_events(spark, "/root/testdata/sf0.001"))
        db.build_rollup(MIN)
        db.compact()
        assert available_rollups(d) == []  # stale after compaction
        assert (FULL_REBUILD, FULL_REBUILD) in read_changelog(d)
        db2 = Database.open(spark, d)
        db2.refresh_rollup(MIN)  # sentinel -> full rebuild path
        assert available_rollups(d) == [MIN]
        assert read_changelog(d) == []
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_filters_respected_through_rollup(spark, wh):
    db = Database.open(spark, wh)
    q = lambda: db.avg("app.purchase", "user").filter("k:1* OR user:3").granularity(HOUR)
    with_r = _key(q().to_df())
    os.rename(f"{wh}/rollup_{MIN}/_FRESH", f"{wh}/rollup_{MIN}/_FRESH.bak")
    try:
        without = _key(q().to_df())
    finally:
        os.rename(f"{wh}/rollup_{MIN}/_FRESH.bak", f"{wh}/rollup_{MIN}/_FRESH")
    assert with_r == without


def test_rewrite_plan_reads_rollup_not_points(spark, wh):
    # the executed plan of an admissible query must scan the rollup_* table
    # (q36's driver registration relies on this rewrite actually firing)
    db = Database.open(spark, wh)
    df = db.avg("app.purchase", "user").granularity(HOUR).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"rollup_{MIN}" in plan
    assert "/points" not in plan
