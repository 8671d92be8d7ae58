"""Measure-first probe (r18, VERDICT r17 item 3): decompose the bloom
dedup family's bench rows, then A/B the multi-consumer checkpoint fix.

The suspicion (guide §2.3/§5): inside `_exact_flags_bloom` +
`exact_dedup_against_bloom` the NEW-batch hash frame is consumed up to
4x (prefilter probes, prefilter re-join, flags semi-join, caller's
distinct-ids join) and on the one-shot `dedup_against_frames` path the
REF hash frame is consumed 2x (bitmap build + verify semi-join) — each
consumer re-scans the text and re-computes md5. At 100 TB those are
full corpus re-scans; the (doc_id, 32-char hash) proxy rows are ~50 B
each, so a lazy localCheckpoint is the §8 "decide with small rows"
trade.

Part 1 decomposes the amortized-ON row stage by stage; part 2 A/Bs the
committed operator change (old module loaded from git) on both the
amortized pair content and the one-shot pipe_bloom_dedup content,
asserting identical verdicts first.

Usage: python scripts/probe_bloom.py [decomp|ab] [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("TALNA_MIN_SCAN_TASKS", CPUS)
OLD_REF = os.environ.get("TALNA_PROBE_OLD_REF", "HEAD")

# the bench constants (bench.py pipe_bloom_amortized*)
AM_M = 1 << 24
AM_K = 2
AM_MULT = 800
AM_BATCHES = 3


def _session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe_bloom")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _docs(spark, dedup_mod):
    from pyspark.sql import functions as F

    return dedup_mod.fan_out(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
    )


def _am_ref(spark, dedup_mod):
    from pyspark.sql import functions as F

    return _docs(spark, dedup_mod).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(AM_MULT - 1))).alias("_s"),
    ).select(
        (F.col("doc_id") * AM_MULT + F.col("_s")).alias("doc_id"),
        F.when(F.col("_s") == 0, F.col("text"))
        .otherwise(
            F.concat_ws("|", F.col("_s").cast("string"), F.col("text"))
        )
        .alias("text"),
    )


def _am_batch(spark, dedup_mod, b):
    from pyspark.sql import functions as F

    return _docs(spark, dedup_mod).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat_ws("|", F.lit(f"batch{b}"), F.col("text")))
        .alias("text"),
    )


def decompose() -> None:
    from pyspark.sql import functions as F

    import talna_spark.pipeline.dedup as dd

    spark = _session()
    sc = spark.sparkContext
    out: dict = {"mode": "decomp", "sf_dir": SF_DIR}

    # ---- amortized-ON row, stage by stage --------------------------
    ref = _am_ref(spark, dd)
    sc.setJobDescription("ref noop (fan+explode x800)")
    out["t_ref_noop"] = _noop(ref)
    sc.setJobDescription("ref md5 noop")
    out["t_refhash_noop"] = _noop(ref.select(F.md5("text").alias("_h")))
    sc.setJobDescription("bloom_build + eager checkpoint")
    t0 = time.perf_counter()
    bm = dd.bloom_build(
        ref.select(F.md5("text").alias("_h")), "_h", m=AM_M, k=AM_K
    ).localCheckpoint()
    out["t_build_ckpt"] = round(time.perf_counter() - t0, 3)

    sc.setJobDescription("fp estimate")
    t0 = time.perf_counter()
    fp = dd.bloom_fp_estimate(bm, AM_M, AM_K)
    out["t_fp_estimate"] = round(time.perf_counter() - t0, 3)
    out["fp"] = round(fp, 4)

    batch = _am_batch(spark, dd, 0)
    new_hashes = batch.select("doc_id", F.md5("text").alias("_h"))
    sc.setJobDescription("batch md5 noop")
    out["t_batchhash_noop"] = _noop(new_hashes)
    sc.setJobDescription("prefilter candidates count")
    t0 = time.perf_counter()
    n_cand = dd.bloom_prefilter(new_hashes, "_h", bm, m=AM_M, k=AM_K).count()
    out["t_prefilter"] = round(time.perf_counter() - t0, 3)
    out["n_cand"] = n_cand
    sc.setJobDescription("full _eda batch")
    t0 = time.perf_counter()
    n_dup = (
        dd.exact_dedup_against_bloom(batch, ref, bm, m=AM_M, k=AM_K)
        .filter("exact_dup")
        .count()
    )
    out["t_eda_full"] = round(time.perf_counter() - t0, 3)
    out["n_dup"] = n_dup

    # ---- one-shot ON row (m=2^16 literal path) ---------------------
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    new_d = d.filter(F.col("doc_id") % 3 != 0)
    ref_d = d.filter(F.col("doc_id") % 3 == 0)
    ref_hashes = ref_d.select(F.md5("text").alias("_h"))
    sc.setJobDescription("oneshot bitmap build+collect (literal path)")
    t0 = time.perf_counter()
    words = dd.bloom_to_words(
        dd.bloom_build(ref_hashes, "_h", m=dd.BLOOM_BITS), dd.BLOOM_BITS
    )
    out["t_oneshot_words"] = round(time.perf_counter() - t0, 3)
    nh = new_d.select("doc_id", F.md5("text").alias("_h"))
    sc.setJobDescription("oneshot literal gate filter count")
    t0 = time.perf_counter()
    out["n_gate"] = nh.filter(
        dd.bloom_might_contain(F.col("_h"), words, dd.BLOOM_BITS)
    ).count()
    out["t_oneshot_gate"] = round(time.perf_counter() - t0, 3)
    sc.setJobDescription("oneshot full ON")
    t0 = time.perf_counter()
    dd.dedup_against_frames(
        new_d=new_d, ref_d=ref_d, bloom_bits=dd.BLOOM_BITS
    ).write.format("noop").mode("overwrite").save()
    out["t_oneshot_on_full"] = round(time.perf_counter() - t0, 3)
    sc.setJobDescription("oneshot full OFF")
    t0 = time.perf_counter()
    dd.dedup_against_frames(
        new_d=new_d, ref_d=ref_d, bloom_bits=None
    ).write.format("noop").mode("overwrite").save()
    out["t_oneshot_off_full"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))
    spark.stop()


def _load_old(tmpdir: str):
    import importlib.util

    src = subprocess.check_output(
        ["git", "show", f"{OLD_REF}:talna_spark/pipeline/dedup.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )
    path = os.path.join(tmpdir, "old_dedup.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("old_dedup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_amortized(spark, mod) -> tuple[float, int]:
    from pyspark.sql import functions as F

    ref = _am_ref(spark, mod)
    t0 = time.perf_counter()
    bm = mod.bloom_build(
        ref.select(F.md5("text").alias("_h")), "_h", m=AM_M, k=AM_K
    ).localCheckpoint()
    tot = 0
    for b in range(AM_BATCHES):
        flags = mod.exact_dedup_against_bloom(
            _am_batch(spark, mod, b), ref, bm, m=AM_M, k=AM_K
        )
        tot += flags.filter("exact_dup").count()
    return round(time.perf_counter() - t0, 3), tot


def _run_oneshot(spark, mod, bits):
    from pyspark.sql import functions as F

    # construction INSIDE the timer — the bench row times
    # qs[key](spark, sf_dir).collect() as one closure, and the literal
    # gate's plan-construction cost is exactly what the expr-array
    # change removes
    t0 = time.perf_counter()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = mod.dedup_against_frames(
        new_d=d.filter(F.col("doc_id") % 3 != 0),
        ref_d=d.filter(F.col("doc_id") % 3 == 0),
        bloom_bits=bits,
    )
    rows = sorted(
        (r["doc_id"], r["verdict"], r["ref_doc_id"], r["jaccard"])
        for r in out.collect()
    )
    return round(time.perf_counter() - t0, 3), rows


def ab() -> None:
    import tempfile

    import talna_spark.pipeline.dedup as new_mod

    spark = _session()
    with tempfile.TemporaryDirectory() as td:
        old_mod = _load_old(td)
        # verdict identity first (one-shot ON content)
        _, rows_old = _run_oneshot(spark, old_mod, new_mod.BLOOM_BITS)
        _, rows_new = _run_oneshot(spark, new_mod, new_mod.BLOOM_BITS)
        assert rows_old == rows_new, "one-shot ON verdicts differ"
        ta_old, n_old = _run_amortized(spark, old_mod)
        ta_new, n_new = _run_amortized(spark, new_mod)
        assert n_old == n_new, f"amortized dup counts differ {n_old}/{n_new}"
        print(f"identity OK (oneshot rows={len(rows_new)}, am dups={n_new})")

        res: dict = {"mode": "ab", "sf_dir": SF_DIR}
        for name, runner in (
            ("amortized", lambda m: _run_amortized(spark, m)[0]),
            (
                "oneshot_on",
                lambda m: _run_oneshot(spark, m, new_mod.BLOOM_BITS)[0],
            ),
        ):
            olds, news = [], []
            for i in range(REPS):
                if i % 2 == 0:
                    olds.append(runner(old_mod))
                    news.append(runner(new_mod))
                else:
                    news.append(runner(new_mod))
                    olds.append(runner(old_mod))
            res[name] = {
                "old": olds, "new": news,
                "old_min": min(olds), "new_min": min(news),
            }
            print(f"{name}: old={olds} new={news}", flush=True)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decomp"
    (decompose if mode == "decomp" else ab)()
