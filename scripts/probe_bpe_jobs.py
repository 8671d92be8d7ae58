"""Jobs-per-merge on the FORCED-distributed BPE trainer (r18, VERDICT
r17 item 4): old single-merge rounds vs the batched-certified rounds.

The cap is monkeypatched to 0 so the distributed loop runs even on
bench-scale word tables. Jobs are counted with a per-run job group via
the status tracker; the merge lists are asserted identical (old module
loaded from git) before anything is timed.

Usage: python scripts/probe_bpe_jobs.py [sf_dir] [n_merges] [reps]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 30
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("TALNA_MIN_SCAN_TASKS", CPUS)
OLD_REF = os.environ.get("TALNA_PROBE_OLD_REF", "HEAD")


def _load_old(tmpdir: str, rel: str = "talna_spark/pipeline/bpe.py"):
    src = subprocess.check_output(
        ["git", "show", f"{OLD_REF}:{rel}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )
    name = "old_" + os.path.basename(rel).removesuffix(".py")
    path = os.path.join(tmpdir, name + ".py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import SparkSession

    import talna_spark.pipeline.bpe as new_mod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe_bpe_jobs")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    with tempfile.TemporaryDirectory() as td:
        old_mod = _load_old(td)
        old_mod.DRIVER_TRAIN_MAX_WORDS = 0
        new_mod_cap = new_mod.DRIVER_TRAIN_MAX_WORDS
        new_mod.DRIVER_TRAIN_MAX_WORDS = 0
        try:
            def run(mod, tag, mode):
                group = f"bpe-{tag}-{time.monotonic_ns()}"
                sc.setJobGroup(group, f"bpe_train forced-distributed {tag}")
                t0 = time.perf_counter()
                merges = mod.bpe_train(
                    spark, SF_DIR, n_merges=N_MERGES, mode=mode
                )
                dt = round(time.perf_counter() - t0, 3)
                sc.setJobGroup(None, None)
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                return merges, jobs, dt

            out: dict = {"sf_dir": SF_DIR, "n_merges": N_MERGES}
            for mode in ("word", "byte"):
                m_old, j_old, t_old = run(old_mod, "old", mode)
                m_new, j_new, t_new = run(new_mod, "new", mode)
                assert m_old == m_new, f"{mode}: merge lists differ"
                olds, news = [(j_old, t_old)], [(j_new, t_new)]
                for i in range(REPS - 1):
                    if i % 2 == 0:
                        news.append(run(new_mod, "new", mode)[1:])
                        olds.append(run(old_mod, "old", mode)[1:])
                    else:
                        olds.append(run(old_mod, "old", mode)[1:])
                        news.append(run(new_mod, "new", mode)[1:])
                out[mode] = {
                    "n_merges_learned": len(m_new),
                    "old_jobs": [j for j, _ in olds],
                    "new_jobs": [j for j, _ in news],
                    "old_sec": [t for _, t in olds],
                    "new_sec": [t for _, t in news],
                    "old_jobs_per_merge": round(
                        olds[0][0] / max(1, len(m_new)), 2
                    ),
                    "new_jobs_per_merge": round(
                        news[0][0] / max(1, len(m_new)), 2
                    ),
                }
                print(f"{mode}: {out[mode]}", flush=True)

            # wordpiece + unigram: the AQE-off scope (no batching —
            # likelihood/EM scores shift under every merge)
            import talna_spark.pipeline.unigram as new_uni
            import talna_spark.pipeline.wordpiece as new_wp

            old_wp = _load_old(td, "talna_spark/pipeline/wordpiece.py")
            old_uni = _load_old(td, "talna_spark/pipeline/unigram.py")
            # the old modules import bpe by name; force-distributed
            # applies via the shared cap attr on each module's bpe ref
            for m2, tag2, fn in (
                (old_wp, "wp_old", lambda m: m.wordpiece_train(
                    spark, SF_DIR, n_merges=N_MERGES)),
                (new_wp, "wp_new", lambda m: m.wordpiece_train(
                    spark, SF_DIR, n_merges=N_MERGES)),
                (old_uni, "uni_old", lambda m: m.unigram_train(
                    spark, SF_DIR, vocab_size=200, seed_size=600,
                    em_iters=2)),
                (new_uni, "uni_new", lambda m: m.unigram_train(
                    spark, SF_DIR, vocab_size=200, seed_size=600,
                    em_iters=2)),
            ):
                group = f"{tag2}-{time.monotonic_ns()}"
                sc.setJobGroup(group, tag2)
                t0 = time.perf_counter()
                result = fn(m2)
                dt = round(time.perf_counter() - t0, 3)
                sc.setJobGroup(None, None)
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                out[tag2] = {"jobs": jobs, "sec": dt}
                out.setdefault("_results", {})[tag2] = result
                print(f"{tag2}: jobs={jobs} sec={dt}", flush=True)
            r = out.pop("_results")
            assert r["wp_old"] == r["wp_new"], "wordpiece vocab differs"
            assert r["uni_old"] == r["uni_new"], "unigram model differs"
            print("wp/uni identity OK")
            print(json.dumps(out))
        finally:
            new_mod.DRIVER_TRAIN_MAX_WORDS = new_mod_cap
    spark.stop()


if __name__ == "__main__":
    main()
