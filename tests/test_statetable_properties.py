"""Property tests for the r7 state-table additions: append-only commits,
compaction, and the bucket hash that history-read pruning rests on.

The temporal join's bucket-pruned emit (``read_buckets`` over
``bucket_for`` of the probe keys) is only sound if (a) append() places
every row in exactly the bucket ``bucket_for`` computes for its key, and
(b) compact() is a pure re-layout (same rows, same epoch stamps).  Both
are asserted here against a plain dict/list model for arbitrary op
sequences — the same dict-replay discipline as ``test_properties.py``.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.streaming.statetable import (
    PartitionedStateTable,
)

#: op sequence: each element is one epoch's batch of (key, value) rows,
#: with an occasional compaction interleaved (None marks "compact here")
_BATCH = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 9)), min_size=0, max_size=6
)
_SEQ = st.lists(
    st.one_of(_BATCH, st.none()), min_size=1, max_size=6
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, f"v{v}") for k, v in rows], "k long, v string"
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=_SEQ)
def test_append_compact_equals_list_model(spark, tmp_path_factory, seq):
    """Any interleaving of appends and compacts reads back exactly the
    accumulated (key, value, epoch) multiset of the list model."""
    root = tmp_path_factory.mktemp("prop")
    t = PartitionedStateTable(str(root / "t"), ["k"], n_buckets=4)
    model: list[tuple[int, str, int]] = []
    epoch = 0
    for step in seq:
        if step is None:
            if model:
                epoch += 1
                t.compact(spark, epoch_id=epoch)
            continue
        t.append(_df(spark, step), epoch_id=epoch)
        model.extend((k, f"v{v}", epoch) for k, v in step)
        epoch += 1
    got = (
        []
        if t.read(spark) is None
        else [
            (r["k"], r["v"], r["__epoch"]) for r in t.read(spark).collect()
        ]
    )
    assert sorted(got) == sorted(model)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.integers(-1000, 1000), min_size=1, max_size=20))
def test_bucket_for_agrees_with_append_placement(
    spark, tmp_path_factory, rows
):
    """Every appended row is readable through read_buckets of EXACTLY the
    bucket bucket_for assigns its key — the invariant the temporal
    join's pruned history read relies on."""
    root = tmp_path_factory.mktemp("bprop")
    t = PartitionedStateTable(str(root / "t"), ["k"], n_buckets=8)
    t.append(
        spark.createDataFrame([(k,) for k in rows], "k long"), epoch_id=0
    )
    buckets = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in set(rows)], "k long")
        .select("k", t.bucket_for(F.col("k")).alias("b"))
        .collect()
    }
    for k, b in buckets.items():
        got = t.read_buckets(spark, [b])
        assert got is not None and k in {r["k"] for r in got.collect()}
        other = [x for x in range(8) if x != b]
        rest = t.read_buckets(spark, other)
        if rest is not None:
            assert k not in {r["k"] for r in rest.collect()}
