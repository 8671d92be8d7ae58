from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("talna_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def make_points(spark, rows):
    """rows: list of (metric, ts, value, tags-dict)."""
    from talna_spark.schema import POINTS_SCHEMA

    data = [(m, int(ts), float(v), dict(tags)) for (m, ts, v, tags) in rows]
    return spark.createDataFrame(data, POINTS_SCHEMA)
