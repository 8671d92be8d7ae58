"""Count-min sketch: never-undercount guarantee, exactness without
collisions, shard-merge property, cross-engine cell grid (DuckDB twin),
and bounded sketch size."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from talna_spark.pipeline.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
    cms_sql_cells,
)


def _freq_df(spark, freqs: dict):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "v string")


def test_cms_never_undercounts_and_exact_without_collisions(spark):
    freqs = {f"key-{i}": (i % 7) + 1 for i in range(200)}
    d = _freq_df(spark, freqs)
    sk = cms_build(d, "v")
    assert sk.count() <= CMS_D * CMS_W  # bounded by the grid
    est = {
        r["v"]: r["est"]
        for r in cms_estimate(d.select("v").distinct(), "v", sk).collect()
    }
    assert set(est) == set(freqs)
    over = 0
    for k, n in freqs.items():
        assert est[k] >= n, (k, est[k], n)  # the CMS guarantee
        over += est[k] - n
    # 200*4 increments over a 4x4096 grid: collisions essentially zero
    assert over <= 4
    # unseen keys estimate EXACTLY zero (absent cells are true zeros)
    ghost = spark.createDataFrame([("never-seen",)], "v string")
    assert cms_estimate(ghost, "v", sk).collect()[0]["est"] == 0
    # NULL keys are not counted
    withnull = _freq_df(spark, {"a": 2}).unionByName(
        spark.createDataFrame([(None,)], "v string")
    )
    sk2 = cms_build(withnull, "v")
    assert sorted(
        (r["v"], r["est"])
        for r in cms_estimate(
            withnull.filter("v IS NOT NULL").distinct(), "v", sk2
        ).collect()
    ) == [("a", 2)]


def test_cms_shard_merge_equals_union(spark):
    a = _freq_df(spark, {"x": 3, "y": 1})
    b = _freq_df(spark, {"x": 2, "z": 5})
    merged = cms_merge(cms_build(a, "v"), cms_build(b, "v"))
    union = cms_build(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )
    est = {
        r["v"]: r["est"]
        for r in cms_estimate(
            spark.createDataFrame([("x",), ("y",), ("z",)], "v string"),
            "v",
            merged,
        ).collect()
    }
    assert est == {"x": 5, "y": 1, "z": 5}


def test_cms_cross_engine_cells_and_estimates(spark):
    """The DuckDB twin computes the IDENTICAL cell grid and estimates —
    the portable-hash contract that lets the x26 cms slice be
    driver-checked."""
    freqs = {f"dom{i}.example": i + 1 for i in range(50)}
    d = _freq_df(spark, freqs)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE vals (v VARCHAR)"
    )
    con.executemany(
        "INSERT INTO vals VALUES (?)",
        [(k,) for k, n in freqs.items() for _ in range(n)],
    )
    eng_cells = sorted(map(tuple, cms_build(d, "v").collect()))
    orc_cells = sorted(
        map(tuple, con.execute(cms_sql_cells("SELECT v FROM vals")).fetchall())
    )
    assert eng_cells == orc_cells
    eng_est = sorted(
        map(
            tuple,
            cms_estimate(d.select("v").distinct(), "v", cms_build(d, "v")).collect(),
        )
    )
    orc_est = sorted(
        map(
            tuple,
            con.execute(
                cms_estimate_sql(
                    "SELECT DISTINCT v FROM vals", "SELECT v FROM vals"
                )
            ).fetchall(),
        )
    )
    assert eng_est == orc_est


def test_cms_validation(spark):
    d = _freq_df(spark, {"a": 1})
    with pytest.raises(ValueError, match="w and depth"):
        cms_build(d, "v", w=0)
    with pytest.raises(ValueError, match="w and depth"):
        cms_build(d, "v", depth=0)


def test_cms_plan_is_sketch_sized(spark):
    """100 TB contract: the build shuffle is the hash-agg over (r, c)
    id-rows (map-side partials, never the key set); the estimate joins
    the sketch BROADCAST."""
    d = _freq_df(spark, {f"k{i}": 2 for i in range(50)})
    sk = cms_build(d, "v")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Window" not in plan
    est = cms_estimate(d.distinct(), "v", sk)
    eplan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in eplan
