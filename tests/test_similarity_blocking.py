"""x12 LSH blocking: the (label, bucket) key must actually split labels,
bounding the quadratic compare per block (r1 VERDICT item 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from talna_spark.pipeline.similarity import LSH_SIGN_DIMS, _emb, _lsh_bucket

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_buckets_split_every_label(spark):
    e = _emb(spark, SF_DIR).withColumn("bkt", _lsh_bucket(F.col("v")))
    sizes = (
        e.groupBy("label", "bkt").count().groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("count").alias("max_block"),
            F.sum("count").alias("label_total"),
        )
        .collect()
    )
    assert sizes, "no labels in testdata"
    for r in sizes:
        # every label splits into multiple blocks, and no block degenerates
        # back into the whole label
        assert r["n_buckets"] > 1, f"label {r['label']} unsplit"
        assert r["max_block"] < r["label_total"]
        assert r["max_block"] <= r["label_total"] - r["n_buckets"] + 1


def test_lsh_bucket_range(spark):
    e = _emb(spark, SF_DIR).withColumn("bkt", _lsh_bucket(F.col("v")))
    lo, hi = e.agg(F.min("bkt"), F.max("bkt")).first()
    assert 0 <= lo <= hi < 2 ** len(LSH_SIGN_DIMS)


def test_ivf_nprobe_full_probe_equals_brute_force(spark):
    # nprobe = all centroids -> candidate set is the whole corpus ->
    # identical to the brute-force baseline (same k, same tie-break)
    from talna_spark.pipeline.similarity import (
        IVF_CENTROIDS, TOP_K, brute_force_topk, ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    bf = sorted(map(tuple, brute_force_topk(spark, sf).collect()))
    full = sorted(map(tuple, ivf_topk(spark, sf, nprobe=IVF_CENTROIDS, k=TOP_K).collect()))
    assert full == bf


def test_ivf_recall_monotonic_in_nprobe(spark):
    from talna_spark.pipeline.similarity import (
        TOP_K, brute_force_topk, ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(spark, sf).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(spark, sf, nprobe=nprobe, k=TOP_K).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 <= r16 == 1.0
    assert r4 > 0  # probing more clusters finds real neighbors


def test_ivf_nprobe_validation(spark):
    import pytest as _pytest

    from talna_spark.pipeline.similarity import ivf_topk

    with _pytest.raises(ValueError, match="nprobe"):
        ivf_topk(spark, "/root/testdata/sf0.001", nprobe=0)
