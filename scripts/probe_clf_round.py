"""Interleaved A/B for the r18 train_classifier single-pass round.

OLD = talna_spark/pipeline/classifier.py at the commit given by
$TALNA_PROBE_OLD_REF (default HEAD), loaded as a separate module from a
git-show snapshot. NEW = the working tree. Asserts the returned model
(weights, bias, loss_history) is EXACTLY equal (==, not approx), then
alternates timed runs of the bench clf_train content (5 rounds, parity
labels) inside one Spark session.

Usage: python scripts/probe_clf_round.py [rounds]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TALNA_PROBE_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("TALNA_MIN_SCAN_TASKS", CPUS)
OLD_REF = os.environ.get("TALNA_PROBE_OLD_REF", "HEAD")


def load_old_module(tmpdir: str):
    src = subprocess.check_output(
        ["git", "show", f"{OLD_REF}:talna_spark/pipeline/classifier.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )
    path = os.path.join(tmpdir, "old_classifier.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("old_classifier", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from talna_spark.pipeline import classifier as new_mod

    with tempfile.TemporaryDirectory() as td:
        old_mod = load_old_module(td)

        spark = (
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .appName("probe-clf-round")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        labels = docs.select(
            "doc_id", (F.col("doc_id") % 2).cast("double").alias("y")
        )

        def run(mod):
            t0 = time.time()
            m = mod.train_classifier(
                docs, labels, n_features=1024, iters=5, lr=1.0
            )
            return time.time() - t0, m

        # bit-identity gate first (also warms both paths' codegen)
        _, m_old = run(old_mod)
        _, m_new = run(new_mod)
        assert m_old["weights"] == m_new["weights"], "weights differ"
        assert m_old["bias"] == m_new["bias"], "bias differs"
        assert m_old["loss_history"] == m_new["loss_history"], "history differs"
        print(f"bit-identity OK (1024 features, 5 iters, {SF_DIR})")

        olds, news = [], []
        for i in range(rounds):
            if i % 2 == 0:
                olds.append(run(old_mod)[0])
                news.append(run(new_mod)[0])
            else:
                news.append(run(new_mod)[0])
                olds.append(run(old_mod)[0])
            print(
                f"round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s",
                flush=True,
            )
        print(f"OLD min={min(olds):.2f} all={[round(x, 2) for x in olds]}")
        print(f"NEW min={min(news):.2f} all={[round(x, 2) for x in news]}")

        # ---- multiclass (the langid_learned trainer) ------------------
        mc_labels = docs.select(
            "doc_id",
            F.concat(F.lit("c"), (F.col("doc_id") % 3)).alias("y"),
        )

        def run_mc(mod):
            t0 = time.time()
            m = mod.train_multiclass(
                docs, mc_labels, n_features=512, iters=4, lr=1.0
            )
            return time.time() - t0, m

        _, mc_old = run_mc(old_mod)
        _, mc_new = run_mc(new_mod)
        assert mc_old["weights"] == mc_new["weights"], "mc weights differ"
        assert mc_old["biases"] == mc_new["biases"], "mc biases differ"
        assert (
            mc_old["loss_history"] == mc_new["loss_history"]
        ), "mc history differs"
        print(f"multiclass bit-identity OK (512 features, 4 iters, 3 classes)")
        olds, news = [], []
        for i in range(rounds):
            if i % 2 == 0:
                olds.append(run_mc(old_mod)[0])
                news.append(run_mc(new_mod)[0])
            else:
                news.append(run_mc(new_mod)[0])
                olds.append(run_mc(old_mod)[0])
            print(
                f"mc round {i}: old={olds[-1]:.2f}s new={news[-1]:.2f}s",
                flush=True,
            )
        print(f"MC OLD min={min(olds):.2f} all={[round(x, 2) for x in olds]}")
        print(f"MC NEW min={min(news):.2f} all={[round(x, 2) for x in news]}")
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
