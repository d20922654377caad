"""Timezone-independent datetime helpers.

Spark's ``date_trunc`` returns TIMESTAMP (with local time zone) even for
TIMESTAMP_NTZ input, silently round-tripping values through the session
timezone.  The engine's changelog timestamps are wall-clock (NTZ — the
reference zeroes snapshot ``ts_ms`` and treats commit times as instants,
``RecordUtils.java:197-207``), so truncation must not depend on the session
timezone of whoever runs the query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "timestamp_ntz'1970-01-01 00:00:00'"

#: units supported by timestampadd/timestampdiff that denote fixed intervals
_FIXED_UNITS = {"SECOND", "MINUTE", "HOUR", "DAY"}


def epoch_seconds(col: str | Column) -> Column:
    """Seconds since epoch of a TIMESTAMP_NTZ wall-clock value — pure NTZ
    arithmetic (``unix_timestamp``/casts would route through the session
    timezone; TIMESTAMP_NTZ cannot CAST to BIGINT at all)."""
    c = col if isinstance(col, str) else None
    if c is None:
        raise TypeError("epoch_seconds requires a column name string")
    return F.expr(f"timestampdiff(SECOND, {_EPOCH}, {c})")


def epoch_micros(col: str | Column) -> Column:
    """Microseconds since epoch of a TIMESTAMP_NTZ wall-clock value — EXACT
    (timestamps are microsecond-resolution, so no truncation occurs).

    Use this — never :func:`epoch_seconds` — whenever the value feeds a
    threshold/band comparison (session gaps, range-join bands): the
    whole-second truncation of ``timestampdiff(SECOND, ...)`` diverges from
    a fractional oracle (DuckDB ``epoch()`` returns DOUBLE) exactly at
    boundary gaps like 1800.886 s.  ``epoch_seconds`` remains correct for
    BUCKETING (floor-division by an integral width commutes with
    truncation)."""
    c = col if isinstance(col, str) else None
    if c is None:
        raise TypeError("epoch_micros requires a column name string")
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH}, {c})")


def date_trunc_ntz(unit: str, col: str | Column) -> Column:
    """Truncate a TIMESTAMP_NTZ column without session-timezone effects.

    Implemented as pure NTZ interval arithmetic
    (``epoch + floor_div(ts - epoch, unit)``) for fixed-width units; falls
    back to ``date_trunc`` + NTZ cast for calendar units (MONTH/YEAR), whose
    truncation is timezone-agnostic on the wall-clock fields themselves.
    """
    name = col if isinstance(col, str) else None
    unit_u = unit.upper()
    if name is None:
        raise TypeError("date_trunc_ntz requires a column name string")
    if unit_u in _FIXED_UNITS:
        return F.expr(
            f"timestampadd({unit_u}, timestampdiff({unit_u}, {_EPOCH}, {name}), {_EPOCH})"
        )
    # Calendar units: truncate wall-clock fields directly.
    return F.expr(
        f"make_timestamp_ntz(year({name}), "
        f"{'month(' + name + ')' if unit_u != 'YEAR' else '1'}, 1, 0, 0, 0)"
    )
