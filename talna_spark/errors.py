"""Error model, mirroring the reference's ``Error`` enum
(reference: src/error.rs:1-45 — variants Io | Storage | InvalidQuery).

Io/Storage map onto Spark/Parquet exceptions which we do not wrap; the
user-facing error our engine can raise itself is ``InvalidQueryError``.
"""


class TalnaError(Exception):
    """Base class for engine errors."""


class InvalidQueryError(TalnaError):
    """Malformed filter DSL or invalid query parameter.

    Mirrors ``Error::InvalidQuery`` (reference src/error.rs, raised from
    the parser paths in src/query/filter.rs:154-293 and src/db.rs:190-192).
    """


class InvalidMetricNameError(TalnaError):
    """Metric name fails charset validation (reference src/metric_name.rs:15-25)."""
