"""Wall-clock helper (reference src/time.rs:6-13, operator O42)."""

from __future__ import annotations

import time


def timestamp() -> int:
    """Current wall-clock time in integer nanoseconds since the Unix epoch."""
    return time.time_ns()
