#!/usr/bin/env python
"""Benchmark harness (BASELINE.md contract): ingest throughput into the
partitioned warehouse, the Q16-analog query latency, warehouse reopen time,
and headline query latencies, at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's billion-point harness shape
(/root/reference/billion/src/main.rs:31-150: timed ingest, timed avg-by-host
query over the newest slice, timed reopen) at the driver's scale factor.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("talna_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from talna_spark.database import Database
    from talna_spark.sources.events import points_from_events

    # warm up the JVM/session so the first timed number isn't JVM startup,
    # and pre-spawn the reusable Python-worker pool (pandas import cost)
    # so pandas-UDF timings measure steady-state, not process startup.
    spark.range(1000).count()
    import pandas as _pd  # noqa: F401

    warm = spark.range(256).selectExpr("id % 8 AS g", "id AS v")
    warm.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), schema="g long, v long"
    ).count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # (a) batch ingest points/s into the partitioned warehouse
    pts = points_from_events(spark, sf_dir)
    n_points = pts.count()
    wh = tempfile.mkdtemp(prefix="talna_bench_wh_")
    try:
        t0 = time.perf_counter()
        wdb = Database.open(spark, wh)
        wdb.write_batch(pts)
        ingest_sec = time.perf_counter() - t0
        timings["ingest"] = round(ingest_sec, 4)
        extra["ingest_points_per_sec"] = round(n_points / ingest_sec, 1)
        extra["n_points"] = n_points

        # (c) reopen: new Database facade over the existing warehouse
        t0 = time.perf_counter()
        Database.open(spark, wh)
        timings["reopen"] = round(time.perf_counter() - t0, 4)

        # warehouse-path Q16 analog (broadcast series join + pruned fact scan)
        t0 = time.perf_counter()
        (
            wdb.avg("app.purchase", "user")
            .filter("user:9 OR user:8")
            .start(entrymod.T_JAN24)
            .to_df()
            .collect()
        )
        timings["q16_warehouse"] = round(time.perf_counter() - t0, 4)
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    # (b) headline view-path queries from the declared inventory
    headline = [
        "q01_avg", "q05_count", "q08_not", "q11_precedence",
        "q16_bench", "q17_greedy_avg",
    ]
    qs = entrymod.queries()
    for name in headline:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "talna_spark e2e suite (ingest+reopen+queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
