"""Date-window derivation and bound computation.

Pure, clock-injectable reimplementation of the reference's scheduling logic:

- ``derive_window``: ``BulkCopyManager.cs:36-85`` (hourly/daily/weekly/
  explicit/unknown-fallback),
- ``midnight_override``: ``BulkCopyManager.cs:116-126`` (sproc window forced
  to yesterday at hour 0),
- ``day_bounds``: the SQL Server datetime-rounding-safe day window
  ``[D1 00:00:00.000, D2 23:59:59.997]`` (``TableCopyService.cs:111-112,
  132-133``, ``TableUpdateService.cs:94-97``).

Windows travel as ``yyyy-MM-dd`` strings exactly like the reference; typed
bounds are produced only at predicate-construction time.
"""

from __future__ import annotations

import logging
from datetime import datetime, timedelta

log = logging.getLogger(__name__)

DATE_FMT = "%Y-%m-%d"


def derive_window(
    schedule_mode: str | None,
    date_from: str | None,
    date_to: str | None,
    now: datetime,
) -> tuple[str | None, str | None]:
    """Derive the ``(dateFrom, dateTo)`` strings for one run.

    Exact branch structure of ``BulkCopyManager.cs:44-85``:

    - null/blank mode: explicit ``DateFrom``/``DateTo`` required, raise if
      either is missing;
    - ``hourly``: today, except yesterday when ``now.hour == 0``;
    - ``daily``: yesterday;
    - ``weekly``: ``[today-8, yesterday]``;
    - anything else: warn and fall back to the explicit dates *without*
      requiring them (the reference's default branch does not throw).

    Mode matching is case-insensitive (the reference lowercases twice,
    ``BulkCopyManager.cs:36,53``).
    """
    mode = schedule_mode.strip().lower() if schedule_mode else None
    if not mode:
        if date_from is None:
            raise ValueError("DateFrom missing in config when ScheduleMode is null.")
        if date_to is None:
            raise ValueError("DateTo missing in config when ScheduleMode is null.")
        return date_from, date_to

    if mode == "hourly":
        day = now - timedelta(days=1) if now.hour == 0 else now
        return day.strftime(DATE_FMT), day.strftime(DATE_FMT)
    if mode == "daily":
        day = now - timedelta(days=1)
        return day.strftime(DATE_FMT), day.strftime(DATE_FMT)
    if mode == "weekly":
        return (
            (now - timedelta(days=8)).strftime(DATE_FMT),
            (now - timedelta(days=1)).strftime(DATE_FMT),
        )

    log.warning("Unknown ScheduleMode '%s', defaulting to explicit dates.", mode)
    return date_from, date_to


def midnight_override(
    date_from: str, date_to: str, now: datetime
) -> tuple[str, str]:
    """Sproc-only override: at hour 0, force the window to yesterday
    regardless of the computed window (``BulkCopyManager.cs:116-126``)."""
    if now.hour == 0:
        y = (now - timedelta(days=1)).strftime(DATE_FMT)
        return y, y
    return date_from, date_to


def day_bounds(date_from: str, date_to: str) -> tuple[datetime, datetime]:
    """Typed window bounds: ``[D1 00:00:00.000, D2 23:59:59.997]``.

    Reproduces ``DateTime.Parse(start).Date`` /
    ``DateTime.Parse(end).Date.AddDays(1).AddMilliseconds(-3)``
    (``TableCopyService.cs:111-112``) — the classic rounding-safe end-of-day
    for SQL Server ``datetime`` (3 ms resolution). Used by the range
    copy/delete predicate, which compares the *raw* datetime column
    (``BETWEEN``, ``TableCopyService.cs:108,127``).
    """
    start = datetime.strptime(date_from, DATE_FMT)
    end = (
        datetime.strptime(date_to, DATE_FMT)
        + timedelta(days=1)
        - timedelta(milliseconds=3)
    )
    return start, end


def day_bounds_dates(date_from: str, date_to: str) -> tuple[str, str]:
    """Day-granularity bounds for the change-detection predicate, which
    compares ``CAST(col AS DATE)`` (``TableUpdateService.cs:84,87``) — a
    subtly *different* granularity from the raw-datetime ``BETWEEN`` used by
    the copy path (SURVEY.md §1.2). Returns the window as plain date strings;
    the operator applies ``to_date(col).between(...)``.
    """
    # Validate format eagerly (the reference's DateTime.Parse would throw).
    datetime.strptime(date_from, DATE_FMT)
    datetime.strptime(date_to, DATE_FMT)
    return date_from, date_to
