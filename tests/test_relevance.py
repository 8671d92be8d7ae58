"""BM25 top-k retrieval (pipeline.relevance) vs its DuckDB oracle twin,
plus ranking-sanity and plan-shape checks."""

from __future__ import annotations

import duckdb
import pytest

from talna_spark.pipeline import relevance as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_bm25_matches_duckdb_oracle(spark, duck):
    got = {
        (r["doc_id"], r["score"], r["rank"])
        for r in R.bm25_topk(spark, SF).collect()
    }
    want = {tuple(t) for t in duck.execute(R.bm25_topk_sql()).fetchall()}
    assert len(got) == R.BM25_TOP_K
    assert got == want


def test_bm25_ranks_denser_match_higher(spark):
    import pandas as pd

    # doc 1 mentions every query term often; doc 2 once; doc 3 never
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "hash join query hash join query hash",
                "one hash mention in filler filler filler",
                "nothing relevant here at all",
            ],
        }
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="talna_bm25_")
    try:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        rows = R.bm25_topk(spark, d, query="hash join query", k=3).collect()
        by_rank = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert by_rank[0] == 1 and by_rank[-1] == 3
        scores = {r["doc_id"]: r["score"] for r in rows}
        assert scores[1] > scores[2] > scores[3] >= 0.0
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_bm25_plan_no_corpus_shuffle_before_topk(spark):
    # the corpus is scanned, stats broadcast back, and scoring is map-side:
    # no SortMergeJoin, no Python, and the only wide exchanges belong to
    # the two-phase rank over <= k x 64 survivors
    plan = R.bm25_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
