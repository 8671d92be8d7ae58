"""Capture .explain("formatted") for every declared query (r17 guide §1:
plan evidence before/after each optimization).

Usage: python scripts/capture_plans.py <outdir> [query ...]
Writes <outdir>/<name>_<tag>.txt per query; tag comes from $PLAN_TAG
(default "before"). Uses sf0.01 (plan SHAPE is scale-independent; the
driver benches sf0.1 but plan capture only needs the same schema).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TALNA_PLAN_SF_DIR", "/root/testdata/sf0.01")
TAG = os.environ.get("PLAN_TAG", "before")


def main() -> int:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("plan-capture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}_{TAG}.txt")
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure, don't abort the sweep
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
