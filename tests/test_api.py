"""API-parity tests: builder pattern, single-point writes, relative bounds,
collect() output shape."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from talna_spark.database import Database
from talna_spark.duration import Duration
from talna_spark.timeutil import timestamp


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="talna_api_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_builder_open_and_single_writes(spark, wh):
    # Database::builder().cache_size_mib(64).hyper_mode(true).open(path)
    # (reference src/db_builder.rs:48-56; knobs are documented no-ops)
    db = Database.builder().cache_size_mib(64).hyper_mode(True).open(spark, wh)
    db.write_at("cpu.total", 1_000_000_000, 25.0, {"host": "h-1"})
    db.write_at("cpu.total", 2_000_000_000, 75.0, {"host": "h-1"})
    res = db.avg("cpu.total", "host").collect()
    assert res["h-1"][0].value == 50.0
    assert res["h-1"][0].len == 2


def test_write_now(spark, wh):
    db = Database.open(spark, wh)
    before = timestamp()
    db.write("mem.used", 1.5, {"host": "h-2"})
    res = db.sum("mem.used", "host").collect()
    assert res["h-2"][0].value == 1.5
    assert res["h-2"][0].start >= before


def test_relative_bounds(spark, wh):
    db = Database.open(spark, wh)
    now = timestamp()
    rows = [("m", now - Duration.hours(2), 1.0, {"h": "a"}),
            ("m", now - Duration.minutes(5), 2.0, {"h": "a"})]
    from tests.conftest import make_points

    db.write_batch(make_points(spark, rows))
    # start_relative(1h): only the 5-minute-old point qualifies
    res = db.sum("m", "h").start_relative(Duration.hours(1)).granularity(None).collect()
    assert res["a"][0].value == 2.0
    res = db.sum("m", "h").granularity(None).collect()
    assert res["a"][0].value == 3.0


def test_collect_newest_first(spark, wh):
    db = Database.open(spark, wh)
    from tests.conftest import make_points

    m = Duration.MINUTE
    rows = [("m2", 0, 1.0, {"h": "a"}), ("m2", m, 2.0, {"h": "a"}),
            ("m2", 2 * m, 3.0, {"h": "a"})]
    db.write_batch(make_points(spark, rows))
    buckets = db.max("m2", "h").collect()["a"]
    # GroupedAggregation order: newest -> oldest (reference stream order)
    assert [b.value for b in buckets] == [3.0, 2.0, 1.0]
    assert buckets[0].middle() == buckets[0].start


def test_sql_escape_hatch_view_backend(spark):
    from tests.conftest import make_points

    rows = [("m", i, float(i), {"h": "a"}) for i in range(5)]
    db = Database.from_points(spark, make_points(spark, rows))
    got = db.sql(
        "SELECT tags['h'] AS h, SUM(value) AS s FROM talna_points GROUP BY 1"
    ).collect()
    assert got[0]["h"] == "a" and got[0]["s"] == 10.0


def test_sql_escape_hatch_warehouse(spark, tmp_path):
    from tests.conftest import make_points

    rows = [("m", i, float(i), {"h": "a"}) for i in range(5)]
    db = Database.open(spark, str(tmp_path / "wh"))
    db.write_batch(make_points(spark, rows))
    n = db.sql(
        "SELECT COUNT(*) AS n FROM talna_points p "
        "JOIN talna_series s USING (series_id)"
    ).collect()[0]["n"]
    assert n == 5


def test_sql_view_refreshes_across_generations(spark, tmp_path):
    """sql()'s memoized view must re-register after write_batch/expire —
    a stale view reads deleted/outdated file listings."""
    from talna_spark.duration import Duration
    from tests.conftest import make_points

    D = Duration.DAY
    db = Database.open(spark, str(tmp_path / "wh"))
    db.write_batch(make_points(spark, [("m", d * D, 1.0, {"h": "a"}) for d in range(4)]))
    q = "SELECT COUNT(*) AS n FROM talna_points"
    assert db.sql(q).collect()[0]["n"] == 4
    db.expire(2 * D)
    assert db.sql(q).collect()[0]["n"] == 2
    db.write_batch(make_points(spark, [("m", 10 * D, 1.0, {"h": "a"})]))
    assert db.sql(q).collect()[0]["n"] == 3


def test_stats_inventory(spark, tmp_path):
    from pyspark.sql import functions as F

    from talna_spark.database import Database
    from tests.conftest import make_points

    wh = str(tmp_path / "wh_stats")
    db = Database.open(spark, wh)
    db.write_batch(make_points(spark, [
        ("m.a", 1_000_000_000, 1.0, {"h": "x"}),
        ("m.a", 2_000_000_000, 2.0, {"h": "y"}),
        ("m.a", 90_000_000_000_000, 3.0, {"h": "x"}),  # a second day
        ("m.b", 5_000_000_000, 4.0, {"h": "x"}),
    ]))
    rows = {r["metric"]: r for r in db.stats().collect()}
    assert rows["m.a"]["n_points"] == 3
    assert rows["m.a"]["n_series"] == 2
    assert rows["m.a"]["n_days"] == 2
    assert rows["m.a"]["min_ts"] == 1_000_000_000
    assert rows["m.a"]["max_ts"] == 90_000_000_000_000
    assert rows["m.b"]["n_points"] == 1 and rows["m.b"]["n_series"] == 1
