"""Metric-name validation (reference src/metric_name.rs:6-25, operator O44).

The reference's doc comment promises ``a-z A-Z 0-9 . _`` but its validation
set is only ``abcdefghijklmnopqrstuvwxyz_.`` (src/metric_name.rs:19), i.e.
uppercase and digits are rejected. We accept the documented-lowercase
superset ``[a-z0-9_.]+`` (lowercase letters, digits, dot, underscore) —
a deliberate, documented deviation (SURVEY.md §1.3).
"""

from __future__ import annotations

import re

from talna_spark.errors import InvalidMetricNameError

_METRIC_RE = re.compile(r"^[a-z0-9_.]+$")


def validate_metric_name(name: str) -> str:
    """Validate and return ``name``; raise :class:`InvalidMetricNameError`.

    Mirrors ``MetricName::try_from`` (reference src/metric_name.rs:15-25).
    """
    if not isinstance(name, str) or not name or not _METRIC_RE.match(name):
        raise InvalidMetricNameError(f"invalid metric name: {name!r}")
    return name
