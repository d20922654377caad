"""The cdclog Python DataSource: batch + streaming reads, startup modes,
snapshot→log phase handoff, changelog materialization end-to-end —
the Spark mirror of MySqlConnectorITCase.testConsumingAllEvents."""

from __future__ import annotations

import json
import os

import pytest

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.debezium import offset_order
from flink_cdc_log_connectors_spark.streaming.pipeline import (
    read_cdc_batch,
    read_cdc_stream,
)

from fixtures import EXPECTED_FINAL, PRODUCTS_PHYSICAL, SEED, write_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("cdclog")
    write_fixture(str(base))
    return str(base)


def test_batch_read_counts(spark, fixture_dir):
    df = read_cdc_batch(
        spark, fixture_dir, PRODUCTS_PHYSICAL, snapshot_path=os.path.join(fixture_dir, "snapshot")
    )
    rows = df.collect()
    # 9 snapshot + 7 changes (4 updates ×2 images + 2 creates + 1 delete) = 20
    assert len(rows) == 9 + 4 * 2 + 2 + 1
    assert {r["op"] for r in rows} == {"r", "c", "u", "d"}


def test_batch_materialization_matches_expected_state(spark, fixture_dir):
    df = read_cdc_batch(
        spark, fixture_dir, PRODUCTS_PHYSICAL, snapshot_path=os.path.join(fixture_dir, "snapshot")
    )
    # snapshot rows (null offsets) sort first, then log by (file, pos,
    # img_seq) — the image index makes the update's after-image win
    from flink_cdc_log_connectors_spark.sources.debezium import (
        CHANGELOG_ORDER_BY,
        offset_sort_columns,
    )

    state = apply_changelog(
        offset_sort_columns(df), keys=["id"], order_by=CHANGELOG_ORDER_BY
    )
    got = {r["id"]: r["weight"] for r in state.collect()}
    assert got == EXPECTED_FINAL


def test_stream_initial_mode_full_materialization(spark, fixture_dir, tmp_path):
    stream = read_cdc_stream(
        spark,
        fixture_dir,
        PRODUCTS_PHYSICAL,
        snapshot_path=os.path.join(fixture_dir, "snapshot"),
        starting_offsets="initial",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_initial")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cdc_initial").collect()
    assert len(out) == 20
    ops = {r["op"] for r in out}
    assert ops == {"r", "c", "u", "d"}


def test_stream_latest_mode_sees_only_new_data(spark, fixture_dir, tmp_path):
    stream = read_cdc_stream(
        spark, fixture_dir, PRODUCTS_PHYSICAL, starting_offsets="latest"
    )
    captured: list = []

    def sink(batch, _eid):
        captured.extend(batch.collect())

    ckpt = str(tmp_path / "ckpt2")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert captured == []

    # append a new log file mid-stream (ITCase mutates the DB mid-test),
    # then RESUME from the same checkpoint — exactly-once continuation
    new_env = {
        "before": None,
        "after": {"id": 200, "name": "late", "description": None, "weight": 9.9},
        "op": "c",
        "ts_ms": 1_800_000_000_000,
        "source": {"db": "inventory", "table": "products", "ts_ms": 1_800_000_000_000,
                   "file": "binlog.000099", "pos": 0},
    }
    with open(os.path.join(fixture_dir, "log", "log-000099.jsonl"), "w") as fh:
        fh.write(json.dumps(new_env) + "\n")
    try:
        q2 = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert [r["id"] for r in captured] == [200]
    finally:
        os.remove(os.path.join(fixture_dir, "log", "log-000099.jsonl"))


def test_stream_timestamp_startup_filters_old_events(spark, fixture_dir, tmp_path):
    # events 0..6 have ts 1_700_000_000_000 + i*1000; start at +3000 → 4 remain
    stream = read_cdc_stream(
        spark,
        fixture_dir,
        PRODUCTS_PHYSICAL,
        starting_offsets="timestamp:1700000003000",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_ts")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT DISTINCT _src.pos AS pos FROM cdc_ts").collect()
    assert sorted(r["pos"] for r in rows) == [3, 4, 5, 6]


def test_offset_order_is_stable(spark, fixture_dir):
    df = read_cdc_batch(spark, fixture_dir, PRODUCTS_PHYSICAL)
    ordered = df.orderBy(*offset_order(df)).select("_src.pos").collect()
    assert [r["pos"] for r in ordered] == sorted(r["pos"] for r in ordered)


def test_idle_source_yields_no_rows_and_stable_offset(spark, fixture_dir, tmp_path):
    """L5 analog: a quiet source produces empty microbatches without
    duplicating data or corrupting the offset (re-trigger on an unchanged
    log → zero new rows, same final offset)."""
    out_rows: list = []

    def run():
        stream = read_cdc_stream(
            spark,
            fixture_dir,
            PRODUCTS_PHYSICAL,
            snapshot_path=os.path.join(fixture_dir, "snapshot"),
            starting_offsets="initial",
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _e: out_rows.extend(b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "idle_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n_first = len(out_rows)
    assert n_first > 0
    run()  # idle: nothing new in the log
    assert len(out_rows) == n_first
    run()  # still idle after two triggers
    assert len(out_rows) == n_first


def test_stream_earliest_mode_log_only_no_snapshot(spark, fixture_dir, tmp_path):
    """`earliest`: log from the beginning, NO snapshot phase — op 'r' rows
    must not appear even when a snapshotPath is configured."""
    stream = read_cdc_stream(
        spark,
        fixture_dir,
        PRODUCTS_PHYSICAL,
        snapshot_path=os.path.join(fixture_dir, "snapshot"),
        starting_offsets="earliest",
    )
    rows: list = []
    q = (
        stream.writeStream.foreachBatch(lambda b, _e: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "earliest_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ops = {r["op"] for r in rows}
    assert "r" not in ops               # no snapshot reads
    assert ops <= {"c", "u", "d"}
    # the full log: 4 updates ×2 images + 2 creates + 1 delete
    assert len(rows) == 4 * 2 + 2 + 1
