"""Mongo change-stream normalization (D7) + session windows + metrics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.mongo import parse_mongo_changestream
from flink_cdc_log_connectors_spark.streaming.pipeline import (
    progress_metrics,
    session_windows,
)

PHYS = T.StructType(
    [
        T.StructField("_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)


def _cs(op_type, doc=None, key=None, ts=1):
    return json.dumps(
        {
            "operationType": op_type,
            "fullDocument": doc,
            "documentKey": key or ({"_id": doc["_id"]} if doc else None),
            "ns": {"db": "shop", "coll": "items"},
            "clusterTime": ts,
        }
    )


def test_mongo_changestream_normalized_to_append_op(spark):
    lines = [
        _cs("insert", {"_id": 1, "name": "alpha"}, ts=1),
        _cs("update", {"_id": 1, "name": "alpha2"}, ts=2),
        _cs("replace", {"_id": 2, "name": "beta"}, ts=3),
        _cs("delete", key={"_id": 2}, ts=4),
    ]
    df = parse_mongo_changestream(
        spark.createDataFrame([(v,) for v in lines], "value string"), PHYS
    )
    rows = df.collect()
    assert [r["op"] for r in rows] == ["c", "u", "u", "d"]
    # delete carries the key with other fields NULL
    d = [r for r in rows if r["op"] == "d"][0]
    assert d["_id"] == 2 and d["name"] is None
    assert rows[0]["_src"]["collection_name"] == "items"
    # materialization works on the normalized stream
    state = apply_changelog(
        df.withColumn("ts", F.col("_src.op_ts_ms")),
        keys=["_id"],
        order_by=["ts"],
    )
    assert {r["_id"]: r["name"] for r in state.collect()} == {1: "alpha2"}


def test_session_windows(spark, tmp_path):
    rows = [
        ("2024-01-01 10:00:00", "u1"),
        ("2024-01-01 10:02:00", "u1"),   # same session (gap < 5m)
        ("2024-01-01 10:30:00", "u1"),   # new session
        ("2024-01-01 11:00:00", "u1"),   # watermark pusher
    ]
    src = spark.createDataFrame(rows, "ts_s string, u string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    path = str(tmp_path / "sess_parquet")
    src.repartition(1).write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    agg = session_windows(stream, "ts", gap="5 minutes", watermark="1 minute", group_cols=["u"])
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = progress_metrics(q)
    got = sorted(
        (r["w"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    # sessions closed by the watermark: [10:00,10:07) n=2 and [10:30,10:35) n=1
    assert got == [("10:00", 2), ("10:30", 1)]
    assert metrics["numInputRows"] is not None
