"""Tracked persistence for operator-internal intermediates.

Operators that feed one DataFrame into multiple plan branches persist it
so the expensive producing pass (usually a Pandas UDF) runs once.  Those
persists are engine-internal — the caller never sees the handle — so
without tracking they accumulate for the lifetime of the session and
slowly crowd the unified memory pool (observed as a creeping slowdown of
every later query in a long workload).

``persist_tracked`` registers the handle; ``release_intermediates`` drops
every tracked block.  Workload drivers (bench harness, long-running
services) call the release between queries; one-shot jobs can ignore it —
the session teardown cleans up anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and remember the handle for release."""
    _TRACKED.append(df.persist())
    return df


def release_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many were held."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _TRACKED.clear()
    return n
