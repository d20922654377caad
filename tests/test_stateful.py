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
