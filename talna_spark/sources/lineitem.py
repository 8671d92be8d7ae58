"""TPC-H ``lineitem`` mapped to the points model — a second concrete view
adapter (after events) proving the engine runs over any tabular source.

  metric = 'tpch.lineitem.revenue'
  ts     = epoch ns of l_shipdate (TIMESTAMP micros in the testdata)
  value  = l_extendedprice * (1 - l_discount)   -- the TPC-H revenue term
  tags   = { rf: l_returnflag, ls: l_linestatus }

``ORACLE_CTE`` holds the DuckDB-side projection generated from the same
constants, so query/oracle pairs over lineitem cannot drift (same pattern
as sources.events.TAG_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRIC = "tpch.lineitem.revenue"

ORACLE_CTE = (
    "WITH pts AS (SELECT epoch_ns(l_shipdate) AS ts, "
    "l_extendedprice * (1 - l_discount) AS value, "
    "l_returnflag AS tag_rf, l_linestatus AS tag_ls FROM lineitem)"
)


def points_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.lit(METRIC).alias("metric"),
        # l_shipdate is TIMESTAMP_NTZ: pure NTZ difference from the epoch
        # (no session timezone anywhere), micros * 1000 -> ns. DuckDB's
        # epoch_ns on its (also tz-less) TIMESTAMP does the same.
        (
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)"
            )
            * F.lit(1000)
        ).alias("ts"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "value"
        ),
        F.map_filter(
            F.create_map(
                F.lit("rf"), F.col("l_returnflag"),
                F.lit("ls"), F.col("l_linestatus"),
            ),
            lambda _k, v: v.isNotNull(),
        ).alias("tags"),
    )


def revenue_by_returnflag_sql(width_ns: int) -> str:
    """Oracle for: sum(revenue) by rf, aligned buckets of width_ns —
    the Q1-flavored query over the lineitem view adapter."""
    w = int(width_ns)
    return (
        f"{ORACLE_CTE} "
        f"SELECT tag_rf AS grp, MIN(ts) AS start_ts, MAX(ts) AS end_ts, "
        f"(ROUND(SUM(value), 6) + 0) AS value, COUNT(*) AS len "
        f"FROM pts WHERE tag_rf IS NOT NULL "
        f"GROUP BY tag_rf, ts // {w}"
    )
