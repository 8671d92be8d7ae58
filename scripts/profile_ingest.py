"""Phase-level profiling of batch ingest at a chosen scale multiple.

Mirrors the CURRENT talna_spark.ingest.write_batch structure exactly
(map-free cached batch, range-partitioned facts write, hash-agg series
dedup) and splits its cost into: source materialization + identity
derivation + persist, the facts write, and the series-dim write — so
throughput plateaus can be attributed to a phase instead of guessed at.

Usage: python scripts/profile_ingest.py [multiple] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("talna-ingest-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from talna_spark.ingest import series_key_from_entries, write_fanout
    from talna_spark.sources.events import points_from_events
    from talna_spark.timeutil import day_col

    # warm-up (JVM, python workers, parquet committer)
    spark.range(1000).count()
    wtmp = tempfile.mkdtemp(prefix="talna_prof_warm_")
    spark.range(64).selectExpr("id", "id % 4 AS p").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(f"{wtmp}/w")
    shutil.rmtree(wtmp, ignore_errors=True)

    t: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        now = time.perf_counter()
        t[name] = round(now - t0, 3)
        print(f"  {name}: {t[name]}s", flush=True)
        return now

    # Scale via explode (see bench.py scale_section for rationale)
    pts1 = points_from_events(spark, sf_dir, parallelism=int(cpus))
    pts = (
        pts1.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        .withColumn("ts", F.col("ts") + F.col("_i") * F.lit(3_600_000_000_000))
        .drop("_i")
    )

    t0 = time.perf_counter()
    # Phase 1: write_batch's enriched projection + persist + count
    enriched = (
        pts.withColumn("_te", F.sort_array(F.map_entries("tags")))
        .withColumn(
            "series_id",
            F.xxhash64(series_key_from_entries(F.col("metric"), F.col("_te"))),
        )
        .withColumn("ts_day", day_col("ts"))
        .withColumn("ingest_seq", F.lit(time.time_ns()))
        .select("series_id", "ts", "value", "metric", "ts_day", "ingest_seq", "_te")
    )
    enriched.persist(StorageLevel.MEMORY_AND_DISK)
    n = enriched.count()
    print(f"rows: {n}")
    t0 = mark("source+identity+persist", t0)

    wh = tempfile.mkdtemp(prefix="talna_prof_wh_")
    try:
        num_parts = write_fanout(n, spark.sparkContext.defaultParallelism)
        print(f"  write fanout: {num_parts} tasks")
        (
            enriched.select(
                "series_id", "ts", "value", "ingest_seq", "metric", "ts_day"
            )
            .repartitionByRange(
                num_parts, F.col("metric"), F.col("ts_day"), F.col("ts")
            )
            .write.mode("append")
            .option("compression", "zstd")
            .partitionBy("metric", "ts_day")
            .parquet(f"{wh}/points")
        )
        t0 = mark("facts_write", t0)
        (
            enriched.select("series_id", "metric", "_te")
            .distinct()
            .withColumn("tags", F.map_from_entries("_te"))
            .withColumn(
                "series_key",
                series_key_from_entries(F.col("metric"), F.col("_te")),
            )
            .select("series_id", "metric", "series_key", "tags")
            .write.mode("append")
            .option("compression", "zstd")
            .parquet(f"{wh}/series")
        )
        t0 = mark("series_write", t0)
        total = sum(t.values())
        print(f"total: {round(total, 2)}s  -> {round(n / total, 1)} pts/s")
        n_dirs = sum(1 for _ in os.scandir(f"{wh}/points"))
        sz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dn, fn in os.walk(f"{wh}/points") for f in fn
        )
        print(f"metric dirs: {n_dirs}; facts bytes: {sz}")
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        enriched.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
