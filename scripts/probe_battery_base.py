"""Interleaved A/B for the r18 x22 shared-signal-base optimization.

OLD = the r17 battery shape, reconstructed from the CURRENT module's
self-contained paths (lm_token_base shared across lm/lm2/lm3 + standalone
cutoff/gopher/c4/clf slices — exactly what _x22_quality_scoring did at
r17 HEAD, since every base/tok default of None preserves those plans).
NEW = _x22_quality_scoring(include_pplbucket=False) on the r18 tree (one
signal_token_base scan for all 7 slices).

Asserts row identity OLD vs NEW first, then alternates noop-sink timed
runs (guide §1.4) inside one Spark session — the only comparison that
counts on this host (see probe_drift.py FINDINGS).

Usage: python scripts/probe_battery_base.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TALNA_PROBE_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("TALNA_MIN_SCAN_TASKS", CPUS)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("probe-battery-base")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from talna_spark.pipeline import classifier as _classifier
    from talna_spark.pipeline import text as _text

    def norm(df, s1, v1, v2, kind):
        return df.select(
            "doc_id",
            s1.cast("string").alias("s1"),
            v1.cast("double").alias("v1"),
            v2.cast("double").alias("v2"),
            F.lit(kind).alias("kind"),
        )

    def build_old(sf):
        base = _text.lm_token_base(spark, sf)
        lm = norm(
            _text.lm_score(spark, sf, base=base),
            F.lit(None), F.col("n_tokens"), F.col("xent"), "lm",
        )
        cut = norm(
            _text.quality_cutoff_filter(spark, sf),
            F.col("source"), F.col("quality"), F.col("cutoff"), "cutoff",
        )
        gopher = norm(
            _text.gopher_rules(spark, sf),
            F.col("verdict"), F.col("fail_mask"), F.col("n_failed"), "gopher",
        )
        c4 = norm(
            _text.c4_rules(spark, sf),
            F.col("verdict"), F.col("fail_mask"), F.col("kept_line_frac"), "c4",
        )
        lm2 = norm(
            _text.lm_score_bigram(spark, sf, base=base),
            F.lit(None), F.col("n_tokens"), F.col("xent2"), "lm2",
        )
        lm3 = norm(
            _text.lm_score_trigram_kn(spark, sf, base=base),
            F.lit(None), F.col("n_tokens"), F.col("xent3"), "lm3",
        )
        clf = norm(
            _classifier.score_documents(spark, sf),
            F.lit(None), F.col("n_tokens"), F.col("clf_score"), "clf",
        )
        return (
            lm.unionByName(cut).unionByName(gopher).unionByName(c4)
            .unionByName(lm2).unionByName(lm3).unionByName(clf)
        )

    def build_new(sf):
        return entrymod._x22_quality_scoring(spark, sf, include_pplbucket=False)

    # ---- row identity gate (sf0.01 to keep the collect small) --------
    small = os.environ.get("TALNA_PROBE_EQ_SF_DIR", "/root/testdata/sf0.01")

    def collect_sorted(df):
        rows = [tuple(r) for r in df.collect()]
        return sorted(rows, key=lambda t: tuple(map(repr, t)))

    a = collect_sorted(build_old(small))
    b = collect_sorted(build_new(small))
    assert a == b, f"row mismatch: {len(a)} vs {len(b)} rows"
    print(f"row identity OK at {small}: {len(a)} rows")

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for i in range(rounds):
        if i % 2 == 0:
            olds.append(run(build_old(SF_DIR)))
            news.append(run(build_new(SF_DIR)))
        else:
            news.append(run(build_new(SF_DIR)))
            olds.append(run(build_old(SF_DIR)))
        print(
            f"round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s", flush=True
        )
    print(f"OLD min={min(olds):.2f} all={[round(x,2) for x in olds]}")
    print(f"NEW min={min(news):.2f} all={[round(x,2) for x in news]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
