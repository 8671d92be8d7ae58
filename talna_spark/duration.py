"""Duration helpers: human units -> nanoseconds
(reference src/duration.rs:1-64, operator O43).

Constants copied from the reference's declared calendar quirks
(src/duration.rs:7-14): a month is exactly 4 weeks (28 days) and a year is
exactly 12 such months (336 days). We keep those constants for parity.

Deviation (documented, SURVEY.md O43): the reference multiplies the
fractional argument at every intermediate base and truncates at each step
(``n as u128``, src/duration.rs:61-63) so ``days(1.5) == days(1)``.
We multiply once in float and truncate once, so ``days(1.5)`` is 36 hours.
"""

from __future__ import annotations


class Duration:
    """Nanosecond helpers. All return ``int`` nanoseconds."""

    NANOSECOND = 1
    MICROSECOND = 1_000
    MILLISECOND = 1_000_000
    SECOND = 1_000_000_000
    MINUTE = 60 * SECOND
    HOUR = 60 * MINUTE
    DAY = 24 * HOUR
    WEEK = 7 * DAY
    MONTH = 4 * WEEK          # reference src/duration.rs:10 (= 28 days)
    YEAR = 12 * MONTH         # reference src/duration.rs:8  (= 336 days)

    @staticmethod
    def nanoseconds(n: float) -> int:
        return int(n)

    @staticmethod
    def microseconds(n: float) -> int:
        return int(n * Duration.MICROSECOND)

    @staticmethod
    def milliseconds(n: float) -> int:
        return int(n * Duration.MILLISECOND)

    @staticmethod
    def seconds(n: float) -> int:
        return int(n * Duration.SECOND)

    @staticmethod
    def minutes(n: float) -> int:
        return int(n * Duration.MINUTE)

    @staticmethod
    def hours(n: float) -> int:
        return int(n * Duration.HOUR)

    @staticmethod
    def days(n: float) -> int:
        return int(n * Duration.DAY)

    @staticmethod
    def weeks(n: float) -> int:
        return int(n * Duration.WEEK)

    @staticmethod
    def months(n: float) -> int:
        return int(n * Duration.MONTH)

    @staticmethod
    def years(n: float) -> int:
        return int(n * Duration.YEAR)
