"""Wall-clock + day-partition helpers (reference src/time.rs:6-13, O42).

``ns_to_day`` / ``day_col`` are THE one definition of the warehouse's
ts_day partition value — ingest (Spark side) and partition pruning
(driver side) must agree bit-for-bit or near-midnight rows silently
vanish from pruned scans. Both are UTC-stable by construction (pure
day-number arithmetic; never the Spark session timezone). The warehouse
layout assumes ts >= 0 (the reference's timestamps are unsigned,
src/lib.rs:108 u128 — pre-1970 points are out of scope by its own data
model)."""

from __future__ import annotations

import datetime as _dt
import time

DAY_NS = 86_400_000_000_000


def timestamp() -> int:
    """Current wall-clock time in integer nanoseconds since the Unix epoch."""
    return time.time_ns()


def ns_to_day(ns: int) -> str:
    """UTC calendar day ('yyyy-MM-dd') containing the ns timestamp."""
    return (
        _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        + _dt.timedelta(days=int(ns) // DAY_NS)
    ).strftime("%Y-%m-%d")


def day_col(ts_col_name: str = "ts"):
    """Spark Column: the same UTC day string, session-timezone-proof.

    ``date_from_unix_date`` is pure day-number -> DATE arithmetic (no
    timezone involved), unlike ``date_format(timestamp_micros(...))``
    which renders in the session timezone and would disagree with
    :func:`ns_to_day` near midnight on non-UTC sessions. Integer ``div``
    (not ``/``) keeps the day index exact — double division of ns-scale
    int64 is ~0.3 s imprecise near the 2^53 mantissa limit.
    """
    from pyspark.sql import functions as F

    return F.date_from_unix_date(
        F.expr(f"{ts_col_name} div {DAY_NS}").cast("int")
    ).cast("string")
