"""Unit tests for bench.py's compact final line (r17, VERDICT r16
item 1) — no Spark session needed. The driver records only the last
~2000 chars of bench stdout and parses the tail's LAST line, so the
final line must stay under budget while carrying every pipe_* row,
the greedy pairs (inside `queries`), and the BASELINE contract keys.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import COMPACT_BUDGET, CONTRACT_KEYS, compact_bench_record


def _fixture(n_pipes: int):
    timings = {
        k: 1.2345
        for k in [
            "ingest", "reopen", "q16_warehouse", "q01_avg_sum",
            "q05_count", "q08_not", "q11_precedence", "q16_bench",
            "q17_greedy_avg", "q29_multigroup", "q32_sliding",
            "pipe_greedy_single", "pipe_greedy_sliced",
            "pipe_greedy_auto", "pipe_greedy1g_single",
            "pipe_greedy1g_sliced",
        ]
    }
    extra = {f"pipe_op_{i:02d}_sec": 12.3456 for i in range(n_pipes)}
    extra["pipe_static_width_ns"] = 3_600_000_000_000  # non-_sec: excluded
    for k in CONTRACT_KEYS:
        extra[k] = 1526005.8 if "points_per_sec" in k else 0.1234
    return timings, extra


def test_r17_sized_record_fits_with_headroom():
    # 32 pipe rows + full contract: the real r17 shape (measured
    # 1828/1833 chars across two runs) must fit without shedding
    timings, extra = _fixture(32)
    line = compact_bench_record(timings, extra, 0.1, 123.4567)
    assert len(line) <= COMPACT_BUDGET
    rec = json.loads(line)
    assert sum(1 for k in rec["extra"] if k.startswith("pipe_")) == 32
    assert "pipe_rows_shed" not in rec["extra"]
    assert "pipe_static_width_ns" not in rec["extra"]  # non-timing pruned
    for k in CONTRACT_KEYS:
        assert k in rec["extra"], k
    # greedy pairs + auto ride in `queries`
    for k in ("pipe_greedy_single", "pipe_greedy_sliced",
              "pipe_greedy_auto", "pipe_greedy1g_sliced"):
        assert k in rec["queries"], k
    # precision trim: timings 3dp, throughputs integer
    assert rec["extra"]["ingest_points_per_sec"] == 1526006
    assert rec["queries"]["ingest"] == 1.234


def test_overflow_sheds_longest_pipes_deterministically_and_loudly():
    timings, extra = _fixture(80)  # far over budget
    line = compact_bench_record(timings, extra, 0.1, 1.0)
    assert len(line) <= COMPACT_BUDGET
    rec = json.loads(line)
    shed = rec["extra"]["pipe_rows_shed"]
    kept = [k for k in rec["extra"]
            if k.startswith("pipe_") and k.endswith("_sec")]
    assert shed == 80 - len(kept) > 0
    # contract keys survive shedding
    for k in CONTRACT_KEYS:
        assert k in rec["extra"], k
    # deterministic: same inputs, same line
    assert compact_bench_record(timings, extra, 0.1, 1.0) == line


def test_budget_raises_when_unfittable():
    # a real RuntimeError, not assert — `python -O` must not silence it
    import pytest

    timings, extra = _fixture(4)
    with pytest.raises(RuntimeError, match="compact bench line"):
        compact_bench_record(timings, extra, 0.1, 1.0, budget=200)
