"""Property-based tests (Hypothesis) — beyond the reference's example-based
suite: chunk plans must partition the key space for ANY stats; changelog
materialization must equal a reference dict-replay for ANY event log."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.chunking import (
    split_even,
    split_from_boundaries,
)


@given(
    min_key=st.integers(-(10**6), 10**6),
    span=st.integers(0, 10**6),
    row_count=st.integers(1, 10**6),
    chunk_size=st.integers(1, 10_000),
)
@settings(max_examples=200, deadline=None)
def test_even_split_partitions_key_space(min_key, span, row_count, chunk_size):
    max_key = min_key + span
    ranges = split_even(min_key, max_key, row_count, chunk_size)
    if ranges is None:  # uneven gate rejected — fine
        return
    assert ranges[0].start is None and ranges[-1].end is None
    # contiguous, ordered, non-empty interior ranges
    for a, b in zip(ranges, ranges[1:]):
        assert a.end == b.start
        if a.start is not None and a.end is not None:
            assert a.start < a.end
    # probe keys across and beyond the domain: exactly one range matches
    probes = {min_key, max_key, min_key - 1, max_key + 1}
    if span:
        probes |= {min_key + span // 2, min_key + 1, max_key - 1}
    for key in probes:
        hits = sum(
            1
            for r in ranges
            if (r.start is None or key >= r.start) and (r.end is None or key < r.end)
        )
        assert hits == 1


@given(boundaries=st.lists(st.integers(-1000, 1000), max_size=20))
@settings(max_examples=100, deadline=None)
def test_boundary_split_partitions_key_space(boundaries):
    ranges = split_from_boundaries(boundaries)
    for key in set(boundaries) | {-2000, 0, 2000}:
        hits = sum(
            1
            for r in ranges
            if (r.start is None or key >= r.start) and (r.end is None or key < r.end)
        )
        assert hits == 1


@st.composite
def changelogs(draw):
    n = draw(st.integers(1, 60))
    events = []
    for offset in range(n):
        key = draw(st.integers(0, 7))
        op = draw(st.sampled_from(["c", "u", "d", "r"]))
        val = draw(st.integers(0, 100))
        events.append((key, val, op, offset))
    return events


@given(log=changelogs())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_changelog_equals_dict_replay(spark, log):
    # reference semantics: replay in offset order into a dict
    expected: dict[int, int] = {}
    for key, val, op, _off in log:
        if op == "d":
            expected.pop(key, None)
        else:
            expected[key] = val
    df = spark.createDataFrame(log, "k int, v int, op string, off long")
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(df, keys=["k"], order_by=["off"]).collect()
    }
    assert got == expected
