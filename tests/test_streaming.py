"""Streaming semantics (SURVEY §5.3): watermarked windows, late-data drop,
stateful dedup, foreachBatch changelog materialization, shouldEmit filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fixtures import EXPECTED_FINAL, PRODUCTS_PHYSICAL, write_fixture
from flink_cdc_log_connectors_spark.streaming.pipeline import (
    dedup_stream,
    materialize_changelog,
    read_cdc_stream,
    should_emit_filter,
    windowed_counts,
)


def test_materialize_changelog_foreachbatch(spark, tmp_path):
    base = tmp_path / "fix"
    write_fixture(str(base))
    stream = read_cdc_stream(
        spark,
        str(base),
        PRODUCTS_PHYSICAL,
        snapshot_path=os.path.join(str(base), "snapshot"),
    )
    from flink_cdc_log_connectors_spark.sources.debezium import (
        CHANGELOG_ORDER_BY,
        offset_sort_columns,
    )

    out_path = str(tmp_path / "state")
    q = materialize_changelog(
        offset_sort_columns(stream),
        keys=["id"],
        order_by=CHANGELOG_ORDER_BY,
        output_path=out_path,
        checkpoint_path=str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    state = spark.read.parquet(out_path)
    got = {r["id"]: r["weight"] for r in state.collect()}
    assert got == EXPECTED_FINAL


def test_windowed_counts_and_late_data_drop(spark, tmp_path):
    # scripted event-time stream: in-order, out-of-order within watermark,
    # and one event far beyond the watermark (must be dropped)
    # batch 1 advances the watermark to 10:15; batch 2 delivers an event
    # older than the watermark, which must be dropped (watermarks only
    # take effect across microbatches)
    batch1 = [
        ("2024-01-01 10:00:30", "a"),
        ("2024-01-01 10:01:10", "a"),
        ("2024-01-01 10:00:50", "b"),   # out-of-order, within watermark
        ("2024-01-01 10:20:00", "a"),   # advances watermark far ahead
    ]
    batch2 = [
        ("2024-01-01 09:00:00", "b"),   # late beyond watermark → dropped
    ]
    path = str(tmp_path / "events_parquet")
    src1 = spark.createDataFrame(batch1, "ts_s string, k string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    src1.repartition(1).write.parquet(path)

    captured: list = []

    def run_once():
        stream = spark.readStream.schema(src1.schema).parquet(path)
        agg = windowed_counts(
            stream, "ts", window="1 minute", watermark="5 minutes", group_cols=["k"]
        )
        q = (
            agg.writeStream.foreachBatch(lambda b, _e: captured.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "wc_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # batch 1: watermark advances to 10:15, nothing closed yet
    src2 = spark.createDataFrame(batch2, "ts_s string, k string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    src2.repartition(1).write.mode("append").parquet(path)
    run_once()  # batch 2: late row dropped; closed windows emitted
    got = {
        (r["w"]["start"].strftime("%H:%M"), r["k"]): r["n"] for r in captured
    }
    # 10:00 window: a=1, b=1; 10:01: a=1.  09:00 late row dropped.
    # (the 10:20 row's window is unclosed in append mode — not emitted)
    assert got == {("10:00", "a"): 1, ("10:00", "b"): 1, ("10:01", "a"): 1}


def test_dedup_stream(spark, tmp_path):
    rows = [
        ("2024-01-01 10:00:00", 1, "x"),
        ("2024-01-01 10:00:20", 1, "x-dup"),
        ("2024-01-01 10:00:40", 2, "y"),
    ]
    src = spark.createDataFrame(rows, "ts_s string, id int, v string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    path = str(tmp_path / "dd_parquet")
    src.repartition(1).write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = dedup_stream(stream, keys=["id"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["id"] for r in spark.sql("SELECT * FROM dd_out").collect())
    assert ids == [1, 2]


def test_should_emit_filter(spark):
    # finished chunks: [0,100) hw=(f1,10); [100,200) hw=(f1,20)
    chunks = spark.createDataFrame(
        [(0, 100, "f1", 10), (100, 200, "f1", 20)],
        "chunk_start int, chunk_end int, hw_file string, hw_pos int",
    )
    events = spark.createDataFrame(
        [
            # (id, file, pos): in chunk1, before its hw → suppressed (P7 merged it)
            (50, "f1", 5),
            # in chunk1, past hw → emitted
            (50, "f1", 15),
            # in chunk2, equal to hw → suppressed (strictly-greater rule)
            (150, "f1", 20),
            # in chunk2, later file → emitted
            (150, "f2", 0),
            # outside every chunk → emitted regardless of offset
            (999, "f0", 0),
        ],
        "id int, file string, pos int",
    ).select(
        "id", F.named_struct(F.lit("file"), F.col("file"), F.lit("pos"), F.col("pos")).alias("_src")
    )
    out = should_emit_filter(events, chunks, key_col="id")
    got = sorted((r["id"], r["_src"]["file"], r["_src"]["pos"]) for r in out.collect())
    assert got == [(50, "f1", 15), (150, "f2", 0), (999, "f0", 0)]
