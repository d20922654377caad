"""Failure injection — the Spark mirror of the reference's failover matrix
(MySqlSourceITCase: FailoverType × FailoverPhase): the streaming query is
killed and restarted after EVERY microbatch (tiny maxLinesPerBatch forces
many batches spanning the snapshot→log boundary); the materialized result
must be exactly-once — no losses, no duplicates."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fixtures import EXPECTED_FINAL, PRODUCTS_PHYSICAL, write_fixture
from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.debezium import (
    CHANGELOG_ORDER_BY,
    offset_sort_columns,
)
from flink_cdc_log_connectors_spark.streaming.pipeline import read_cdc_stream


def test_restart_after_every_microbatch_is_exactly_once(spark, tmp_path):
    base = tmp_path / "fix"
    write_fixture(str(base))
    captured: list = []

    def run_one_batch():
        stream = read_cdc_stream(
            spark,
            str(base),
            PRODUCTS_PHYSICAL,
            snapshot_path=os.path.join(str(base), "snapshot"),
            max_lines_per_batch=4,  # snapshot(9) + log(7) → ≥4 batches
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, eid: captured.extend((eid, tuple(r)) for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    # "kill" after each microbatch by letting the query terminate and
    # restarting from the checkpoint — 10 restarts is enough to drain
    seen_batches = set()
    for _ in range(10):
        run_one_batch()
        seen_batches = {eid for eid, _ in captured}
        if len(captured) >= 20:
            break

    assert len(seen_batches) >= 3, "expected multiple microbatches"
    rows = [r for _, r in captured]
    # exactly-once: 20 physical change rows, no duplicates by (id, op, offset)
    assert len(rows) == 20
    assert len(set(rows)) == 20

    df = spark.createDataFrame(
        [r for r in rows],
        read_cdc_stream(
            spark, str(base), PRODUCTS_PHYSICAL, snapshot_path=str(base) + "/snapshot"
        ).schema,
    )
    state = apply_changelog(
        offset_sort_columns(df), keys=["id"], order_by=CHANGELOG_ORDER_BY
    )
    got = {r["id"]: r["weight"] for r in state.collect()}
    assert got == EXPECTED_FINAL
