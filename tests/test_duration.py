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
