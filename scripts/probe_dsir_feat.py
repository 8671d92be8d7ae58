"""Measure-first probe (r17): is dsir_select's double evaluation of the
gram explode+hash (`feat` feeds the model agg AND the scoring agg) worth
a localCheckpoint on `feat`?

The trade at 100 TB: `feat` is ~2 rows per token of (id, bool, int) —
checkpointing it materializes a corpus-gram-scale frame to save one
explode+hash recompute from the already-checkpointed token arrays. Only
worth it if the explode dominates. Interleaved A/B, one session.

Usage: python scripts/probe_dsir_feat.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("TALNA_MIN_SCAN_TASKS", cpus)

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from talna_spark.pipeline.sampling import (
        DSIR_BUCKETS, DSIR_SELECT_K, dsir_select,
    )
    from talna_spark.pipeline.portable import grams, hash64, tokens
    from talna_spark.pipeline.scan import fan_out

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_dsir_feat")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def variant():
        # dsir_select with ONE extra localCheckpoint on `feat`
        m = DSIR_BUCKETS
        d = fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        d = d.select(
            "doc_id", "text", (F.col("doc_id") % 97 == 0).alias("is_target")
        )
        d = d.select(
            "doc_id", "is_target", tokens(F.col("text")).alias("_w")
        ).localCheckpoint(eager=False)
        toks = F.col("_w")
        feat = d.select(
            "doc_id",
            "is_target",
            F.explode(F.concat(grams(toks, 1), grams(toks, 2))).alias("gram"),
        ).select(
            "doc_id", "is_target", (hash64(F.col("gram")) % m).alias("bucket")
        ).localCheckpoint(eager=False)
        model = feat.groupBy("bucket").agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_c"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("r_c"),
        )
        tot = model.agg(
            F.sum("t_c").alias("t_all"), F.sum("r_c").alias("r_all")
        )
        lam = model.crossJoin(F.broadcast(tot)).select(
            "bucket",
            F.round(
                (
                    F.log((F.col("t_c") + 1.0) / (F.col("t_all") + F.lit(m)))
                    - F.log((F.col("r_c") + 1.0) / (F.col("r_all") + F.lit(m)))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lam_micro"),
        )
        scored = (
            feat.filter(~F.col("is_target"))
            .join(F.broadcast(lam), "bucket")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum("lam_micro").alias("weight_micro"),
            )
        )
        order = [F.col("weight_micro").desc(), F.col("doc_id").asc()]
        w1 = Window.partitionBy("_p").orderBy(*order)
        w2 = Window.partitionBy(F.lit(1)).orderBy(*order)
        return (
            scored.withColumn("_p", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
            .withColumn("_r", F.row_number().over(w1))
            .filter(F.col("_r") <= DSIR_SELECT_K)
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= DSIR_SELECT_K)
            .select("doc_id", "n_grams", "weight_micro", "rank")
        )

    a = sorted(map(tuple, dsir_select(spark, sf_dir).collect()))
    b = sorted(map(tuple, variant().collect()))
    assert a == b, f"rows differ: {len(a)} vs {len(b)}"

    olds, news = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        assert dsir_select(spark, sf_dir).collect()
        olds.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        assert variant().collect()
        news.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir, "old": olds, "new_featckpt": news,
        "old_min": min(olds), "new_min": min(news),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
