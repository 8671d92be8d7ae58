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


def test_relative_bound_underflow(spark, wh):
    """r16 reference audit (VERDICT r15 item 7): the reference's
    ``start_relative``/``end_relative`` compute ``timestamp() - window``
    on u128 (src/agg/builder.rs:75/:89, src/time.rs:6-13). A window
    larger than the epoch clock (~1.8e18 ns — Duration.years(62)
    crosses it today, and the reference has ZERO upstream coverage of
    relative bounds) underflows: debug builds panic ("attempt to
    subtract with overflow"); release builds wrap. The wrap direction
    differs per bound:

    - start_relative: min_ts wraps to ~u128::MAX -> silently EMPTY
      (db.rs:129-133 scans keys with ts >= ~MAX).
    - end_relative: max_ts wraps to ~u128::MAX -> silently EVERYTHING
      ("all points older than 62 years ago" should be nothing; the
      wrapped upper bound admits the whole series instead — the
      semantics invert).

    Our engine raises InvalidQueryError at the API boundary (a
    pre-epoch bound is a caller bug); this test pins the deviation."""
    from talna_spark.errors import InvalidQueryError

    db = Database.open(spark, wh)
    big = Duration.years(100)  # > now() for the next ~38 years
    assert big > timestamp()
    with pytest.raises(InvalidQueryError, match=">= 0"):
        db.sum("m", "h").start_relative(big)
    with pytest.raises(InvalidQueryError, match=">= 0"):
        db.sum("m", "h").end_relative(big)


def _rust_aggregate_fold(kind, vals):
    """Literal port of the reference's aggregation fold for the NaN
    audit: stream.rs:68-80 seeds ``A::init(first)`` then folds
    ``A::transform``; min.rs:6/max.rs:6 use Rust ``f32::min``/``max``
    ("if one of the arguments is NaN, then the other argument is
    returned" — NaN-SKIPPING); sum/avg accumulate ``+`` (NaN poisons);
    count adds 1.0 per point regardless (count.rs:9-11)."""
    import math

    acc = vals[0]
    for x in vals[1:]:
        if kind == "min":
            acc = x if math.isnan(acc) else (acc if math.isnan(x) else min(acc, x))
        elif kind == "max":
            acc = x if math.isnan(acc) else (acc if math.isnan(x) else max(acc, x))
        else:  # sum / avg
            acc = acc + x
    if kind == "avg":
        return acc / len(vals)
    if kind == "count":
        return float(len(vals))
    return acc


def test_nan_value_semantics_pinned(spark, wh):
    """r16 reference audit: NaN data points have ZERO upstream coverage
    and three different behaviors exist —

    - reference (Rust f32 folds): min/max SKIP NaN, sum/avg poison,
      count counts it;
    - our aligned mode (Spark builtins, documented NaN-is-greatest
      ordering): F.min skips NaN like the reference but F.max returns
      NaN; sum/avg/count like the reference;
    - our greedy mode (numpy reduceat): min AND max propagate NaN —
      and the mapInPandas Arrow boundary then renders the NaN result
      as SQL NULL (pandas' NaN-is-missing convention), so a poisoned
      greedy bucket surfaces as value=None, not float('nan').

    The engine's contract: NaN is OUT of the value domain. The scalar
    write/write_at path rejects it loudly (the only place validation is
    free); the bulk write_batch path is garbage-in by design (no isnan
    tax on a 100 TB ingest) and this test pins its exact per-mode
    behavior so the inconsistency is documented, not latent."""
    import math

    from tests.conftest import make_points

    db = Database.open(spark, wh)
    t0 = 1_000_000_000_000
    rows = [("m", t0, 1.0, {"h": "a"}),
            ("m", t0 + 10**9, float("nan"), {"h": "a"}),
            ("m", t0 + 2 * 10**9, 3.0, {"h": "a"})]
    db.write_batch(make_points(spark, rows))

    def one_bucket(kind, mode):
        res = (
            getattr(db, kind)("m", "h")
            .granularity(Duration.hours(1))
            .mode(mode)
            .collect()
        )
        (b,) = res["a"]
        assert b.len == 3  # count/len sees the NaN point in every engine
        return b.value

    def eq(a, b):
        if a is None or b is None:
            return a is b
        return (math.isnan(a) and math.isnan(b)) or a == b

    nan = float("nan")
    aligned_expect = {"min": 1.0, "max": nan, "sum": nan, "avg": nan,
                      "count": 3.0}
    greedy_expect = {"min": None, "max": None, "sum": None, "avg": None,
                     "count": 3.0}
    ref_expect = {"min": 1.0, "max": 3.0, "sum": nan, "avg": nan,
                  "count": 3.0}
    desc_vals = [3.0, nan, 1.0]  # the reference folds newest-first
    for kind in ("min", "max", "sum", "avg", "count"):
        assert eq(one_bucket(kind, "aligned"), aligned_expect[kind]), kind
        assert eq(one_bucket(kind, "greedy"), greedy_expect[kind]), kind
        assert eq(_rust_aggregate_fold(kind, desc_vals), ref_expect[kind]), kind


def test_scalar_write_rejects_nan(spark, wh):
    from talna_spark.errors import InvalidQueryError

    db = Database.open(spark, wh)
    with pytest.raises(InvalidQueryError, match="NaN"):
        db.write_at("m", 1_000, float("nan"), {"h": "a"})
    with pytest.raises(InvalidQueryError, match="NaN"):
        db.write("m", float("nan"), {"h": "a"})
    db.write_at("m", 1_000, 1.5, {"h": "a"})  # real values unaffected


def test_grouped_collect_idempotent_r17_audit(spark, wh):
    """r17 AUDIT closeout (src/agg/group.rs:7-73, VERDICT r16 item 4):
    the reference's GroupedAggregation is CONSUME-ONCE — `collect(self)`
    takes ownership (double-collect is a compile error, so that arm is
    CLEAN by construction) — but its Deref/DerefMut/IntoIterator impls
    (group.rs:12-45) hand out the live per-group Aggregator iterators,
    so draining one group partially and THEN collecting silently omits
    the drained buckets (iterator state is shared; zero upstream
    coverage of mixed iteration+collect). Its collect is also fail-stop
    across groups: the first `bucket?` (group.rs:66) aborts the whole
    map, discarding every completed group. Engine contract pinned here:
    our collect() re-executes an immutable plan — IDEMPOTENT (equal
    dicts on repeat calls), no shared iterator state to half-drain, and
    failures are Spark job failures (no partially-wrong result)."""
    db = Database.open(spark, wh)
    db.write_at("m", 1_000, 2.0, {"h": "a"})
    db.write_at("m", 2_000, 4.0, {"h": "a"})
    db.write_at("m", 1_500, 8.0, {"h": "b"})
    b = db.avg("m", "h")
    first = b.collect()
    second = b.collect()
    assert first == second
    assert sorted(first) == ["a", "b"]
    assert [bk.len for bk in first["a"]] == [2]


def test_ingest_validation_error_type(spark, wh):
    """ADVICE r16: ingest-side validation raises InvalidValueError — a
    ValueError subclass with an honest name — while REMAINING an
    InvalidQueryError so every pre-existing catch site keeps matching.
    Timestamp validation (shared by ingest and the query-bound setters)
    uses the same type."""
    from talna_spark.errors import InvalidQueryError, InvalidValueError

    assert issubclass(InvalidValueError, InvalidQueryError)
    assert issubclass(InvalidValueError, ValueError)
    db = Database.open(spark, wh)
    with pytest.raises(InvalidValueError, match="NaN"):
        db.write_at("m", 1_000, float("nan"), {"h": "a"})
    with pytest.raises(InvalidValueError, match=">= 0 ns"):
        db.write_at("m", -1, 1.0, {"h": "a"})
    with pytest.raises(ValueError):  # the Pythonic catch works too
        db.write("m", float("nan"), {"h": "a"})


def test_inverted_bounds_deterministic_empty(spark, wh):
    """r16 reference audit: with start > end the reference builds an
    inverted fjall key range (db.rs:142-145 — start key ``!max`` sorts
    AFTER end key ``!min``); what fjall yields for an inverted range is
    fjall-defined and unverifiable here (no fjall source in the
    sandbox). Our engine's contract is pinned instead: deterministic
    EMPTY, never an error, never spurious rows."""
    db = Database.open(spark, wh)
    from tests.conftest import make_points

    db.write_batch(make_points(spark, [("m", 1000, 1.0, {"h": "a"})]))
    res = db.sum("m", "h").start(2000).end(500).granularity(None).collect()
    assert res == {}


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


def test_where_value_row_level_predicate(spark, tmp_path):
    """r6: the row-level value predicate (§2.2: absent in the reference).
    Points below the threshold vanish BEFORE bucketing; the predicate
    reaches the scan as a pushed filter and disables the rollup
    rewrite."""
    import pytest as _pytest

    from talna_spark.database import Database
    from talna_spark.errors import InvalidQueryError
    from tests.conftest import make_points

    pts = make_points(spark, [
        ("m.v", 1_000_000_000, 1.0, {"h": "x"}),
        ("m.v", 2_000_000_000, 10.0, {"h": "x"}),
        ("m.v", 3_000_000_000, 20.0, {"h": "x"}),
    ])
    db = Database.from_points(spark, pts)
    rows = (
        db.avg("m.v", "h").granularity(None).where_value(">=", 10.0)
        .to_df().collect()
    )
    assert len(rows) == 1
    assert rows[0]["value"] == 15.0 and rows[0]["len"] == 2
    # == and != forms
    eq = db.count("m.v", "h").granularity(None).where_value("==", 10.0).to_df().collect()
    assert eq[0]["value"] == 1.0
    ne = db.count("m.v", "h").granularity(None).where_value("!=", 10.0).to_df().collect()
    assert ne[0]["value"] == 2.0
    with _pytest.raises(InvalidQueryError, match="value predicate"):
        db.avg("m.v", "h").where_value("~", 1.0)
    # the predicate appears in the scan's pushed filters (no post-agg
    # filtering of already-bucketed rows)
    wh = str(tmp_path / "wh_vp")
    wdb = Database.open(spark, wh)
    wdb.write_batch(pts)
    df = wdb.avg("m.v", "h").granularity(None).where_value(">=", 10.0).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(value,10.0)" in plan


def test_cube_grouping_sets(spark):
    """r6 cube(): every subset of the group tags aggregates in ONE pass;
    the all-star row is the grand total and single-tag rollups match the
    corresponding plain group-bys exactly."""
    import pytest as _pytest

    from talna_spark.database import Database
    from talna_spark.errors import InvalidQueryError
    from tests.conftest import make_points

    pts = make_points(spark, [
        ("m.c", 1_000_000_000, 1.0, {"a": "p", "b": "q"}),
        ("m.c", 2_000_000_000, 3.0, {"a": "p", "b": "r"}),
        ("m.c", 3_000_000_000, 5.0, {"a": "s", "b": "q"}),
        ("m.c", 4_000_000_000, 100.0, {"a": "s"}),  # lacks b: dropped (O25)
    ])
    db = Database.from_points(spark, pts)
    rows = {
        r["grp"]: r
        for r in db.sum("m.c", ["a", "b"]).granularity(None).cube()
        .to_df().collect()
    }
    assert rows["a:*,b:*"]["value"] == 9.0  # grand total (100 dropped)
    assert rows["a:p,b:*"]["value"] == 4.0
    assert rows["a:*,b:q"]["value"] == 9.0 - 3.0
    assert rows["a:p,b:q"]["value"] == 1.0
    assert len(rows) == 1 + 2 + 2 + 3  # all + a-rollups + b-rollups + pairs
    # single-tag rollup rows equal the plain one-tag group-by
    single = {
        r["grp"]: r["value"]
        for r in db.sum("m.c", "a").granularity(None).to_df().collect()
    }
    # note: plain group-by-a does NOT drop the b-less row (O25 applies
    # per group set) — so compare only on the b-carrying subset
    assert rows["a:p,b:*"]["value"] == single["p"]
    with _pytest.raises(InvalidQueryError, match="two group tags"):
        db.sum("m.c", "a").cube()
    # one Expand-style pass: a single hash-agg pair, no join/repeat scan
    plan = (
        db.sum("m.c", ["a", "b"]).granularity(None).cube().to_df()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_rollup_sets_hierarchy(spark):
    """r6 rollup_sets(): only PREFIX subsets aggregate — rollup rows are
    a strict subset of cube rows, and the hierarchy levels (both tags /
    first tag / grand total) match cube's corresponding rows exactly."""
    from talna_spark.database import Database
    from tests.conftest import make_points

    pts = make_points(spark, [
        ("m.r", 1_000_000_000, 1.0, {"a": "p", "b": "q"}),
        ("m.r", 2_000_000_000, 3.0, {"a": "p", "b": "r"}),
        ("m.r", 3_000_000_000, 5.0, {"a": "s", "b": "q"}),
    ])
    db = Database.from_points(spark, pts)
    base = db.sum("m.r", ["a", "b"]).granularity(None)
    cube = {r["grp"]: tuple(r) for r in base.cube().to_df().collect()}
    base2 = db.sum("m.r", ["a", "b"]).granularity(None)
    roll = {r["grp"]: tuple(r) for r in base2.rollup_sets().to_df().collect()}
    # rollup = pairs + a-rollups + grand total; NO b-rollups
    assert set(roll) == {
        "a:p,b:q", "a:p,b:r", "a:s,b:q", "a:p,b:*", "a:s,b:*", "a:*,b:*",
    }
    assert all(k.startswith("a:*,b:") is False or k == "a:*,b:*" for k in roll)
    assert "a:*,b:q" in cube and "a:*,b:q" not in roll
    for k, v in roll.items():
        assert cube[k] == v, k


def test_cube_with_series_kinds(spark):
    """r7 (ADVICE): cube composes with the per-series kinds — the
    grouping-set explode runs AFTER the rate/increase/twa/
    distinct_series transform, so lag-based kinds see each physical
    point exactly once per series and the rolled-up slots aggregate the
    DERIVED values (previously this path crashed: the transforms'
    re-select dropped _cube_grp)."""
    import pytest as _pytest

    from talna_spark.database import Database
    from talna_spark.errors import InvalidQueryError
    from tests.conftest import make_points

    s = 1_000_000_000  # 1 s in ns
    pts = make_points(spark, [
        # series A (a=p, b=q): rates 1.0 then 2.0 units/s
        ("m.k", 0 * s, 0.0, {"a": "p", "b": "q"}),
        ("m.k", 10 * s, 10.0, {"a": "p", "b": "q"}),
        ("m.k", 20 * s, 30.0, {"a": "p", "b": "q"}),
        # series B (a=p, b=r): rate 2.0
        ("m.k", 0 * s, 0.0, {"a": "p", "b": "r"}),
        ("m.k", 10 * s, 20.0, {"a": "p", "b": "r"}),
    ])
    db = Database.from_points(spark, pts)

    def _collect(builder):
        return {r["grp"]: r["value"] for r in builder.to_df().collect()}

    # rate: per-series derivative first, buckets AVERAGE the rates
    rates = _collect(db.rate("m.k", ["a", "b"]).granularity(None).cube())
    assert rates["a:p,b:q"] == _pytest.approx(1.5)
    assert rates["a:p,b:r"] == _pytest.approx(2.0)
    assert rates["a:p,b:*"] == _pytest.approx(5.0 / 3.0)
    assert rates["a:*,b:*"] == _pytest.approx(5.0 / 3.0)

    # increase: reset-aware deltas, buckets SUM them
    inc = _collect(db.increase("m.k", ["a", "b"]).granularity(None).cube())
    assert inc["a:p,b:q"] == _pytest.approx(30.0)
    assert inc["a:p,b:*"] == _pytest.approx(50.0)

    # twa: hold-until-next weights computed per SERIES, pooled per group
    twa = _collect(db.time_weighted_avg("m.k", ["a", "b"])
                   .granularity(None).cube())
    assert twa["a:p,b:q"] == _pytest.approx(5.0)   # (0*10 + 10*10) / 20
    assert twa["a:p,b:r"] == _pytest.approx(0.0)   # only v=0 carries weight
    assert twa["a:p,b:*"] == _pytest.approx(100.0 / 30.0)

    # distinct_series: rolled-up slots count series across the rollup
    ds = _collect(db.distinct_series("m.k", ["a", "b"])
                  .granularity(None).cube())
    assert ds["a:p,b:q"] == 1.0
    assert ds["a:p,b:*"] == 2.0
    assert ds["a:*,b:*"] == 2.0

    # cube/rollup_sets are mutually exclusive in either order
    with _pytest.raises(InvalidQueryError, match="mutually exclusive"):
        db.sum("m.k", ["a", "b"]).cube().rollup_sets()
    with _pytest.raises(InvalidQueryError, match="mutually exclusive"):
        db.sum("m.k", ["a", "b"]).rollup_sets().cube()


def test_cube_rollup_idempotent_reset(spark):
    # ADVICE r7: re-setting the SAME mode is a no-op, not an error
    from talna_spark.database import Database
    from tests.conftest import make_points

    rows = [("m.k", 0, 1.0, {"a": "p", "b": "q"}),
            ("m.k", 0, 2.0, {"a": "p", "b": "r"})]
    db = Database.from_points(spark, make_points(spark, rows))
    q = db.sum("m.k", ["a", "b"]).cube().cube()  # no raise
    q2 = db.sum("m.k", ["a", "b"]).cube()
    assert q2.cube() is q2  # idempotent re-set returns the same builder
    r = db.sum("m.k", ["a", "b"]).rollup_sets().rollup_sets()  # no raise
    assert len(q.collect()) > 0 and len(r.collect()) > 0
