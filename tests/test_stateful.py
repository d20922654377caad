"""applyInPandasWithState: per-key state persists across microbatches."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.streaming.stateful import running_counts


def test_running_counts_accumulate_across_batches(spark, tmp_path):
    path = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    captured: list = []

    def run_once():
        stream = spark.readStream.schema("k int, v double").parquet(path)
        out = running_counts(stream, keys=["k"], value_col="v")
        q = (
            out.writeStream.foreachBatch(
                lambda b, _e: captured.extend(tuple(r) for r in b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 10.0)], "k int, v double").repartition(1).write.mode("append").parquet(path)
    run_once()
    first = {r[0]: (r[1], r[2]) for r in captured}
    assert first == {1: (2, 5.0), 2: (1, 10.0)}

    captured.clear()
    spark.createDataFrame([(1, 5.0), (3, 1.0)], "k int, v double").repartition(1).write.mode("append").parquet(path)
    run_once()
    second = {r[0]: (r[1], r[2]) for r in captured}
    # state persisted: key 1 continues from (2, 5.0)
    assert second == {1: (3, 10.0), 3: (1, 1.0)}


def test_transform_with_state_changelog_materialization(spark, tmp_path):
    """TWS state machine: upserts then a delete across two microbatches;
    per-key state survives batches in the RocksDB store and deletes emit
    tombstones."""
    import pytest

    # TWS ships state over a protobuf channel; the container lacks
    # google.protobuf, so this runs only where the dependency exists.
    pytest.importorskip("google.protobuf.descriptor")

    from flink_cdc_log_connectors_spark.streaming.stateful import (
        materialize_with_state,
    )

    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        path = str(tmp_path / "tws_src")
        b1 = spark.createDataFrame(
            [(1, 10.0, "c", 1), (1, 11.0, "u", 2), (2, 20.0, "c", 3)],
            "id int, value double, op string, seq long",
        )
        b1.repartition(1).write.parquet(path)
        captured: dict = {}

        def run():
            stream = spark.readStream.schema(b1.schema).parquet(path)
            out = materialize_with_state(stream, "id")
            q = (
                out.writeStream.foreachBatch(
                    lambda b, _e: captured.update(
                        {r["id"]: (r["value"], r["present"]) for r in b.collect()}
                    )
                )
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        assert captured == {1: (11.0, True), 2: (20.0, True)}
        # batch 2: delete key 1 (plus an out-of-order stale row, ignored)
        b2 = spark.createDataFrame(
            [(1, None, "d", 4), (2, 19.0, "u", 1)],
            "id int, value double, op string, seq long",
        )
        b2.repartition(1).write.mode("append").parquet(path)
        captured.clear()
        run()
        # key 1 tombstoned; key 2's stale seq=1 ignored → no change emitted
        # (or re-emitted with unchanged value, depending on touch semantics)
        assert captured[1] == (None, False)
        if 2 in captured:
            assert captured[2] == (20.0, True)
        # batch 3: stale upsert (seq=3 < tombstone seq=4) must NOT
        # resurrect the deleted key — the tombstone keeps the seq
        # watermark in state.
        b3 = spark.createDataFrame(
            [(1, 99.0, "u", 3)], "id int, value double, op string, seq long"
        )
        b3.repartition(1).write.mode("append").parquet(path)
        captured.clear()
        run()
        if 1 in captured:
            assert captured[1] == (None, False)
    finally:
        if old_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
