"""Shared source-scan fan-out (r6, replacing six per-operator
``parallelism`` knobs).

Compute-heavy document operators (LSH signatures, curation, DSIR,
mixture, dup-span, n-gram LM scoring) do most of their work INSIDE the
scan stage — with broadcast models the scoring runs where the text is
read. On a real multi-file source that stage is as parallel as the file
count and this module is a no-op; on a single-row-group bench/test file
the whole operator would serialize onto ONE task. ``fan_out`` widens
such a scan to ``TALNA_MIN_SCAN_TASKS`` tasks — and ONLY then: the
default (unset/0) keeps every operator's declared plan shape
(shuffle-free where the plan tests assert it), because the repartition
IS an Exchange that moves document text.

Benchmarks set the env var once instead of threading a knob through
every call site; production jobs on many-file sources never need it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ENV_VAR = "TALNA_MIN_SCAN_TASKS"


def min_scan_tasks() -> int:
    return int(os.environ.get(ENV_VAR, "0") or 0)


def fan_out(d: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition ``d`` on ``key`` up to ``TALNA_MIN_SCAN_TASKS`` tasks
    when its scan currently plans FEWER tasks than that; identity
    otherwise (including the unset default). Called by the
    compute-in-scan operators only — map-only projections keep their
    zero-shuffle plans regardless of the env var."""
    m = min_scan_tasks()
    if m > 0 and d.rdd.getNumPartitions() < m:
        return d.repartition(m, key)
    return d
