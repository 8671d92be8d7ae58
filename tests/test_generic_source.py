"""Generic source adapter: CSV/JSON/tabular -> points mapping feeds the
full query stack."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from talna_spark.database import Database
from talna_spark.duration import Duration
from talna_spark.sources.generic import points_from_csv, points_from_table


@pytest.fixture()
def csv_dir(spark):
    d = tempfile.mkdtemp(prefix="talna_csv_")
    rows = [
        (0, "s1", 20.0),
        (30, "s1", 22.0),
        (90, "s2", 30.0),
        (95, "s2", None),  # null value row: still a point (value null ok? no — cast keeps null)
    ]
    spark.createDataFrame(rows, "epoch_s long, site string, temp double").write.mode(
        "overwrite"
    ).option("header", "true").csv(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_to_points_to_query(spark, csv_dir):
    pts = points_from_csv(
        spark,
        csv_dir,
        metric=F.lit("sensors.temp"),
        ts=F.col("epoch_s").cast("long") * 1_000_000_000,
        value=F.col("temp"),
        tags={"site": F.col("site"), "unit": F.lit("c")},
    ).filter(F.col("value").isNotNull())
    db = Database.from_points(spark, pts)
    res = db.avg("sensors.temp", "site").granularity(Duration.minutes(1)).collect()
    assert res["s1"][0].value == pytest.approx(21.0)
    assert res["s1"][0].len == 2
    assert res["s2"][0].value == pytest.approx(30.0)


def test_null_tags_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "x")], "ts long, t1 string, t2 string"
    )
    pts = points_from_table(
        df,
        metric=F.lit("m"),
        ts=F.col("ts"),
        value=F.lit(1.0),
        tags={"t1": F.col("t1"), "t2": F.col("t2")},
    )
    maps = [r["tags"] for r in pts.orderBy("ts").collect()]
    assert maps[0] == {"t1": "a"}
    assert maps[1] == {"t2": "x"}


def test_group_by_missing_tag_drops_series(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "ts long, site string")
    pts = points_from_table(
        df,
        metric=F.lit("m"),
        ts=F.col("ts"),
        value=F.lit(1.0),
        tags={"site": F.col("site")},
    )
    res = Database.from_points(spark, pts).count("m", "site").collect()
    assert list(res) == ["a"]  # the null-site point has no series tag -> dropped


def test_points_from_orc_table(spark, tmp_path):
    """ORC round-trip through the generic adapter: a third file format
    (beyond parquet/CSV/JSON) driven through the same engine — Spark's
    native ORC reader plus points_from_table, end to end to a query."""
    from pyspark.sql import functions as F

    from talna_spark.database import Database
    from talna_spark.sources.generic import points_from_table

    src = spark.createDataFrame(
        [
            ("s1", 1_700_000_000, 1.0),
            ("s1", 1_700_000_060, 3.0),
            ("s2", 1_700_000_030, 10.0),
        ],
        "site string, observed_at long, temp double",
    )
    path = str(tmp_path / "sensors_orc")
    src.write.format("orc").save(path)

    pts = points_from_table(
        spark.read.format("orc").load(path),
        metric=F.lit("sensors.temp"),
        ts=F.col("observed_at") * 1_000_000_000,
        value=F.col("temp"),
        tags={"site": F.col("site")},
    )
    rows = (
        Database.from_points(spark, pts)
        .avg("sensors.temp", "site")
        .granularity(None)
        .to_df()
        .collect()
    )
    got = {r["grp"]: (r["value"], r["len"]) for r in rows}
    assert got == {"s1": (2.0, 2), "s2": (10.0, 1)}
