"""Stateful streaming greedy rollup: open buckets survive micro-batch
boundaries in operator state; closed buckets emit exactly once."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from talna_spark.schema import POINTS_SCHEMA
from talna_spark.streaming.stateful import greedy_rollup_stream
from tests.conftest import make_points

S = 1_000_000_000  # 1s in ns
W = 10 * S

# batch 1: group a gets points at 0s and 5s (one open bucket)
ROWS1 = [
    ("m", 0 * S, 1.0, {"h": "a"}),
    ("m", 5 * S, 3.0, {"h": "a"}),
]
# batch 2: 8s joins the open bucket (8-0 <= 10s); 25s closes it and opens
# a new one; group b appears fresh
ROWS2 = [
    ("m", 8 * S, 5.0, {"h": "a"}),
    ("m", 25 * S, 7.0, {"h": "a"}),
    ("m", 30 * S, 9.0, {"h": "b"}),
]


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"talna_state_{k}_") for k in ("src", "out", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run_stream(spark, dirs, kind):
    make_points(spark, ROWS1).write.mode("append").parquet(dirs["src"])
    stream = spark.readStream.schema(POINTS_SCHEMA).parquet(dirs["src"])
    rolled = greedy_rollup_stream(stream, "h", kind=kind, width_ns=W)
    q = (
        rolled.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = spark.read.schema(rolled.schema).parquet(dirs["out"]).collect()
        make_points(spark, ROWS2).write.mode("append").parquet(dirs["src"])
        q.processAllAvailable()
        final = spark.read.schema(rolled.schema).parquet(dirs["out"]).collect()
    finally:
        q.stop()
    return mid, final


def test_open_bucket_held_then_closed(spark, dirs):
    mid, final = _run_stream(spark, dirs, "avg")
    # after batch 1 nothing is closed: the 0-5s bucket is still open
    assert mid == []
    closed = sorted((r["grp"], r["start_ts"], r["end_ts"], r["value"], r["len"]) for r in final)
    # batch 2 closes exactly the {0,5,8}s bucket; 25s bucket and group b stay open
    assert closed == [("a", 0, 8 * S, pytest.approx(3.0), 3)]


def test_sum_kind(spark, dirs):
    _, final = _run_stream(spark, dirs, "sum")
    closed = [(r["grp"], r["value"], r["len"]) for r in final]
    assert closed == [("a", pytest.approx(9.0), 3)]


def test_unsupported_kind_raises(spark):
    # the kind check fires before any plan is built
    with pytest.raises(ValueError):
        greedy_rollup_stream(make_points(spark, ROWS1), "h", kind="p95")
