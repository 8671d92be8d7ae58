"""LSH hot-bucket guard: a degenerate corpus (identical-text flood) must
not go quadratic in the band self-join, and the exclusion must be
reported, never silent."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def flood_dir():
    """1000 identical short docs (one LSH bucket per band) plus two
    distinct near-duplicate docs that share shingles with nothing else."""
    d = tempfile.mkdtemp(prefix="talna_lsh_flood_")
    boiler = "click here to accept all cookies on this site"
    near_a = "the quick brown fox jumps over the lazy dog tonight again"
    near_b = "the quick brown fox jumps over the lazy dog tonight"
    rows = [{"doc_id": i, "text": boiler} for i in range(1000)]
    rows.append({"doc_id": 2000, "text": near_a})
    rows.append({"doc_id": 2001, "text": near_b})
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_lsh_hot_bucket_guard_bounds_candidates(spark, flood_dir):
    from talna_spark.pipeline.dedup import lsh_hot_buckets, lsh_near_dup_pairs

    cap = 50
    pairs = lsh_near_dup_pairs(spark, flood_dir, max_bucket=cap).collect()
    # the flood's ~500k within-bucket pairs are excluded wholesale; the
    # genuine near-dup pair outside the hot buckets is still found
    flood_pairs = [p for p in pairs if p["doc_a"] < 1000 and p["doc_b"] < 1000]
    assert flood_pairs == []
    assert any(
        (p["doc_a"], p["doc_b"]) == (2000, 2001) and p["jaccard"] >= 0.8
        for p in pairs
    )

    # ...and the exclusion is reported loudly: every band's flood bucket
    # appears with its true membership
    hot = lsh_hot_buckets(spark, flood_dir, max_bucket=cap).collect()
    assert len(hot) == 4  # one hot key per band (identical signatures)
    assert all(r["n_docs"] == 1000 for r in hot)


def test_lsh_default_cap_keeps_driver_corpus_intact(spark):
    from talna_spark.pipeline.dedup import lsh_hot_buckets

    # the driver testdata has no bucket anywhere near the default cap, so
    # x07's oracle comparison is unaffected by the guard
    assert lsh_hot_buckets(spark, SF).count() == 0


def test_exact_dedup_catches_the_flood(spark, flood_dir):
    from talna_spark.pipeline.dedup import exact_survivors

    # the documented division of labor: identical-text floods are exact
    # dedup's job — one hash-agg row for all 1000 copies
    rows = exact_survivors(spark, flood_dir).collect()
    flood = [r for r in rows if r["n_copies"] == 1000]
    assert len(flood) == 1 and flood[0]["keep_doc"] == 0
