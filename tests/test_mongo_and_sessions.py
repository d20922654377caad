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


def test_mongo_copy_existing_exactly_once(spark, tmp_path):
    """copy.existing: resume token captured BEFORE the copy — pre-token
    events are never replayed (their effects are already in the copied
    docs), post-token events stream normally, and the keyed upsert
    resolves copy/stream overlap (mirrors MongoDBConnectorSourceTask's
    copy-existing-then-resume protocol)."""
    import os

    from flink_cdc_log_connectors_spark.sources.mongo import read_mongo_stream

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    existing = tmp_path / "existing"
    existing.mkdir()
    # pre-token history: if any of it were replayed, _id=1 would regress
    # to "stale" and _id=9 (deleted long ago) would resurrect
    with open(stream_dir / "cs-000001.jsonl", "w") as fh:
        fh.write(_cs("insert", {"_id": 1, "name": "stale"}, ts=1) + "\n")
        fh.write(_cs("insert", {"_id": 9, "name": "ghost"}, ts=2) + "\n")
        fh.write(_cs("delete", key={"_id": 9}, ts=3) + "\n")
    # current collection contents (reflects all pre-token history)
    with open(existing / "docs.jsonl", "w") as fh:
        fh.write('{"_id": 1, "name": "one-current"}\n')
        fh.write('{"_id": 2, "name": "two"}\n')
        fh.write('{"_id": 3, "name": "three"}\n')

    stream = read_mongo_stream(
        spark,
        str(stream_dir),
        PHYS,
        existing_path=str(existing),
        database="shop",
        collection="items",
        max_lines_per_batch=2,  # force the copy to span multiple batches
    )
    captured: list = []

    def sink(batch, _eid):
        captured.extend(batch.collect())

    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)
    # copy only: 3 inserts, no pre-token replay
    assert sorted(r["_id"] for r in captured) == [1, 2, 3]
    assert {r["name"] for r in captured} == {"one-current", "two", "three"}
    assert {r["op"] for r in captured} == {"c"}

    # post-copy changes arrive; resume from the SAME checkpoint
    with open(stream_dir / "cs-000002.jsonl", "w") as fh:
        fh.write(_cs("update", {"_id": 1, "name": "one-v2"}, ts=10) + "\n")
        fh.write(_cs("insert", {"_id": 4, "name": "four"}, ts=11) + "\n")
        fh.write(_cs("delete", key={"_id": 2}, ts=12) + "\n")
    q2 = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(120)
    assert len(captured) == 6  # 3 copies + 3 streamed, nothing dropped/dup'd
    assert "stale" not in {r["name"] for r in captured}
    assert "ghost" not in {r["name"] for r in captured}

    # keyed materialization ordered by op_ts resolves the overlap
    df = spark.createDataFrame(captured)
    state = apply_changelog(
        df.withColumn("ts", F.col("_src.op_ts_ms")), keys=["_id"], order_by=["ts"]
    )
    assert {r["_id"]: r["name"] for r in state.collect()} == {
        1: "one-v2",
        3: "three",
        4: "four",
    }


def test_bson_converter_tree(spark):
    """Canonical extended-JSON wrappers and relaxed plain values both land
    as typed engine values (D7 BSON converter tree)."""
    from decimal import Decimal

    from flink_cdc_log_connectors_spark.sources.mongo import parse_bson_document

    phys = T.StructType(
        [
            T.StructField("big", T.LongType(), True),
            T.StructField("small", T.IntegerType(), True),
            T.StructField("f", T.DoubleType(), True),
            T.StructField("dec", T.DecimalType(10, 2), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("oid", T.StringType(), True),
            T.StructField("flag", T.BooleanType(), True),
        ]
    )
    canonical = json.dumps(
        {
            "big": {"$numberLong": "9007199254740993"},
            "small": {"$numberInt": "7"},
            "f": {"$numberDouble": "2.5"},
            "dec": {"$numberDecimal": "12.34"},
            "ts": {"$date": {"$numberLong": "1700000000000"}},
            "blob": {"$binary": {"base64": "aGk=", "subType": "00"}},
            "oid": {"$oid": "652f1d7e8a9b0c1d2e3f4a5b"},
            "flag": True,
        }
    )
    relaxed = json.dumps(
        {
            "big": 42,
            "small": 3,
            "f": 1.25,
            "dec": 9.5,
            "ts": "2023-11-14T22:13:20Z",
            "blob": None,
            "oid": "plain-string",
            "flag": False,
        }
    )
    out = parse_bson_document(
        spark.createDataFrame([(canonical,), (relaxed,)], "doc string"), phys
    ).collect()
    c = out[0]
    assert c["big"] == 9007199254740993 and c["small"] == 7
    assert c["f"] == 2.5 and c["dec"] == Decimal("12.34")
    assert c["ts"].year in (2023,)  # 2023-11-14T22:13:20 UTC
    assert bytes(c["blob"]) == b"hi"
    assert c["oid"] == "652f1d7e8a9b0c1d2e3f4a5b" and c["flag"] is True
    r = out[1]
    assert r["big"] == 42 and r["small"] == 3 and r["f"] == 1.25
    assert r["dec"] == Decimal("9.50") and r["oid"] == "plain-string"
    assert r["flag"] is False and r["ts"] is not None
