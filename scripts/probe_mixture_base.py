"""Interleaved A/B probe for the shared mixture-family token base
(r17 optimization round, "Not yet optimized" item 4).

OLD: each `_mix_scaffold` user (mixture / upsample / alpha in the
pipe_mixture bench content; + doremi / tbudget in the full x23 row)
builds its OWN tokenized (doc_id, source, n_tokens) projection — one
corpus tokenize pass per sampler, each behind its own localCheckpoint.

NEW (simulated here by memoizing the scaffold's `d` per sf_dir inside
this process — the exact effect of the planned `base=` param): ONE
tokenize pass materialized once, every sampler's per-source aggregate
and broadcast-rate join reading from the same checkpointed RDD.

Both sides run in ONE Spark session, tightly interleaved (the recorded
probe discipline: the host throttles sustained load, so only
same-session alternating pairs are comparable), min-of-N, rows asserted
identical before any timing is trusted.

Usage: python scripts/probe_mixture_base.py [sf_dir] [reps]
Prints one JSON line.
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

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from talna_spark.pipeline import sampling

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_mixture_base")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # NEW = HEAD's _x23_mixture_sample (one mix_token_base shared by
    # every _mix_scaffold sampler). OLD = the pre-change shape,
    # recovered by making the scaffold IGNORE the shared base so each
    # sampler rebuilds its own tokenized projection + checkpoint.
    orig_scaffold = sampling._mix_scaffold

    def old_scaffold(spark_, sf_dir_, weight_col=None, weights_df=None,
                     base=None):
        return orig_scaffold(spark_, sf_dir_, weight_col, weights_df,
                             base=None)

    def new_df(full: bool):
        return entrymod._x23_mixture_sample(spark, sf_dir, include_doremi=full)

    def old_df(full: bool):
        sampling._mix_scaffold = old_scaffold
        try:
            return entrymod._x23_mixture_sample(
                spark, sf_dir, include_doremi=full
            )
        finally:
            sampling._mix_scaffold = orig_scaffold

    # correctness gate first: identical rows on the bench content AND
    # the full driver row (doremi + tbudget ride the scaffold too)
    for full in (False, True):
        a = sorted(map(tuple, old_df(full).collect()))
        b = sorted(map(tuple, new_df(full).collect()))
        assert a == b, f"rows differ (full={full}): {len(a)} vs {len(b)}"

    def run_once(mk, full: bool) -> float:
        t0 = time.perf_counter()
        rows = mk(full).collect()
        dt = round(time.perf_counter() - t0, 3)
        assert rows
        return dt

    res = {"sf_dir": sf_dir, "reps": reps}
    for full, tag in ((False, "bench5"), (True, "x23full")):
        olds, news = [], []
        for _ in range(reps):  # tight interleave: O,N,O,N,...
            olds.append(run_once(old_df, full))
            news.append(run_once(new_df, full))
        res[f"{tag}_old"] = olds
        res[f"{tag}_new"] = news
        res[f"{tag}_old_min"] = min(olds)
        res[f"{tag}_new_min"] = min(news)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
