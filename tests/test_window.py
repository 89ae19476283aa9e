"""Unit tests for window derivation (reference BulkCopyManager.cs:36-85,
116-126) and bound computation (TableCopyService.cs:111-112)."""

from datetime import datetime

import pytest
from hypothesis import given
from hypothesis import strategies as st

from data_warehouse_copy_spark.window import (
    day_bounds,
    day_bounds_dates,
    derive_window,
    midnight_override,
)

NOON = datetime(2024, 3, 15, 12, 30, 0)
MIDNIGHT = datetime(2024, 3, 15, 0, 5, 0)


def test_hourly_daytime_is_today():
    assert derive_window("hourly", None, None, NOON) == ("2024-03-15", "2024-03-15")


def test_hourly_midnight_is_yesterday():
    assert derive_window("hourly", None, None, MIDNIGHT) == (
        "2024-03-14",
        "2024-03-14",
    )


def test_daily_is_yesterday():
    assert derive_window("daily", None, None, NOON) == ("2024-03-14", "2024-03-14")
    # daily has NO midnight special-case (only hourly does)
    assert derive_window("daily", None, None, MIDNIGHT) == ("2024-03-14", "2024-03-14")


def test_weekly_is_minus8_to_yesterday():
    assert derive_window("weekly", None, None, NOON) == ("2024-03-07", "2024-03-14")


def test_null_mode_requires_explicit_dates():
    assert derive_window(None, "2024-01-01", "2024-01-31", NOON) == (
        "2024-01-01",
        "2024-01-31",
    )
    with pytest.raises(ValueError, match="DateFrom missing"):
        derive_window(None, None, "2024-01-31", NOON)
    with pytest.raises(ValueError, match="DateTo missing"):
        derive_window("", "2024-01-01", None, NOON)


def test_unknown_mode_falls_back_without_requiring_dates():
    # Reference default branch warns and uses explicit dates even if null
    # (BulkCopyManager.cs:79-84) — it does NOT throw.
    assert derive_window("monthly", None, None, NOON) == (None, None)
    assert derive_window("MONTHLY", "2024-01-01", "2024-01-02", NOON) == (
        "2024-01-01",
        "2024-01-02",
    )


def test_mode_is_case_insensitive():
    assert derive_window("HOURLY", None, None, NOON) == ("2024-03-15", "2024-03-15")
    assert derive_window(" Daily ", None, None, NOON) == ("2024-03-14", "2024-03-14")


def test_midnight_override_for_sprocs():
    assert midnight_override("2024-03-15", "2024-03-15", MIDNIGHT) == (
        "2024-03-14",
        "2024-03-14",
    )
    assert midnight_override("2024-03-01", "2024-03-10", NOON) == (
        "2024-03-01",
        "2024-03-10",
    )


def test_day_bounds_997_end_of_day():
    start, end = day_bounds("2024-03-01", "2024-03-05")
    assert start == datetime(2024, 3, 1, 0, 0, 0)
    assert end == datetime(2024, 3, 5, 23, 59, 59, 997000)


def test_day_bounds_single_day():
    start, end = day_bounds("2024-02-29", "2024-02-29")  # leap day
    assert start == datetime(2024, 2, 29)
    assert end == datetime(2024, 2, 29, 23, 59, 59, 997000)


def test_day_bounds_dates_passthrough_and_validation():
    assert day_bounds_dates("2024-01-01", "2024-01-02") == ("2024-01-01", "2024-01-02")
    with pytest.raises(ValueError):
        day_bounds_dates("01/02/2024", "2024-01-02")


@given(
    st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2050, 12, 31)),
)
def test_hourly_midnight_property(now):
    """hourly == daily exactly when hour == 0; otherwise hourly is today."""
    hourly = derive_window("hourly", None, None, now)
    daily = derive_window("daily", None, None, now)
    if now.hour == 0:
        assert hourly == daily
    else:
        assert hourly == (now.strftime("%Y-%m-%d"), now.strftime("%Y-%m-%d"))


@given(
    st.dates(min_value=datetime(1970, 1, 1).date(), max_value=datetime(2100, 1, 1).date()),
    st.dates(min_value=datetime(1970, 1, 1).date(), max_value=datetime(2100, 1, 1).date()),
)
def test_day_bounds_property(d1, d2):
    start, end = day_bounds(d1.strftime("%Y-%m-%d"), d2.strftime("%Y-%m-%d"))
    assert start.time().isoformat() == "00:00:00"
    assert end.microsecond == 997000
    assert end.second == 59
