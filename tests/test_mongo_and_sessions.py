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


def test_collection_regex_discovery(spark, tmp_path):
    """CollectionDiscoveryUtils parity: database/collection options are
    comma-separated REGEX lists; copy.existing discovers the matched
    collections from the <root>/<db>/<coll>.jsonl layout and stamps each
    copied row with ITS OWN namespace."""
    from flink_cdc_log_connectors_spark.sources.mongo import (
        MongoCdcDataSource,
        collection_matcher,
        discover_collections,
        parse_mongo_changestream,
    )

    # matcher semantics: db regex full-match; coll regex bare or qualified
    m = collection_matcher("shop|crm", "items.*,crm\\.leads")
    assert m("shop", "items") and m("shop", "items_v2")
    assert m("crm", "leads")  # qualified entry
    assert m("crm", "items_archive")  # bare entry matches in any included db
    assert not m("warehouse", "items")  # db list excludes
    assert not m("shop", "orders")  # unmatched collection

    root = tmp_path / "mongo"
    for db, coll, docs in [
        ("shop", "items", [{"_id": 1, "name": "a"}, {"_id": 2, "name": "b"}]),
        ("shop", "orders", [{"_id": 7, "name": "should-not-copy"}]),
        ("crm", "leads", [{"_id": 3, "name": "c"}]),
    ]:
        d = root / db
        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"{coll}.jsonl", "w") as fh:
            for doc in docs:
                fh.write(json.dumps(doc) + "\n")
    found = discover_collections(str(root), "shop|crm", "items,crm\\.leads")
    assert [(d, c) for d, c, _p in found] == [("crm", "leads"), ("shop", "items")]

    stream_dir = tmp_path / "cs"
    stream_dir.mkdir()
    spark.dataSource.register(MongoCdcDataSource)
    raw = (
        spark.readStream.format("mongocdc")
        .option("path", str(stream_dir))
        .option("existingPath", str(root))
        .option("database", "shop|crm")
        .option("collection", "items,crm\\.leads")
        .load()
    )
    rows = []
    q = (
        parse_mongo_changestream(raw, PHYS)
        .writeStream.foreachBatch(lambda b, _e: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ns = {(r["_src"]["database_name"], r["_src"]["collection_name"], r["_id"]) for r in rows}
    assert ns == {("crm", "leads", 3), ("shop", "items", 1), ("shop", "items", 2)}
    assert not any(r["_id"] == 7 for r in rows)  # shop.orders not matched


def test_filter_collections_stream_filter(spark):
    """L3-parity post-parse filter: regex lists over the parsed stream's
    namespace metadata, pure Catalyst."""
    from flink_cdc_log_connectors_spark.sources.mongo import filter_collections

    def cs(db, coll, _id):
        return json.dumps(
            {
                "operationType": "insert",
                "fullDocument": {"_id": _id, "name": f"{db}.{coll}"},
                "documentKey": {"_id": _id},
                "ns": {"db": db, "coll": coll},
                "clusterTime": 1,
            }
        )

    df = spark.createDataFrame(
        [(cs("shop", "items", 1),), (cs("shop", "audit_log", 2),),
         (cs("crm", "leads", 3),), (cs("warehouse", "items", 4),)],
        "value string",
    )
    parsed = parse_mongo_changestream(df, PHYS)
    kept = filter_collections(parsed, databases="shop|crm", collections="items,crm\\.leads")
    assert sorted(r["_id"] for r in kept.collect()) == [1, 3]
    # db-only filtering
    only_db = filter_collections(parsed, databases="shop")
    assert sorted(r["_id"] for r in only_db.collect()) == [1, 2]


def test_fetch_emit_delay_gauges_scripted():
    """C11 delay gauges from a scripted StreamingQueryProgress dict — the
    reference's currentFetchEventTimeLag / currentEmitEventTimeLag
    (SourceReaderMetrics.java:87) derived from the lag observation."""
    from flink_cdc_log_connectors_spark.streaming.pipeline import progress_metrics

    p = {
        "batchId": 7,
        "numInputRows": 100,
        "inputRowsPerSecond": 50.0,
        "processedRowsPerSecond": 40.0,
        "timestamp": "2026-08-13T12:00:05.000Z",
        "durationMs": {"triggerExecution": 2000},
        "observedMetrics": {
            "cdc_lag": {
                # newest event committed at 12:00:00; connector emitted it
                # 1.5 s after commit
                "max_op_ts_ms": 1786622400000,  # 2026-08-13T12:00:00Z
                "max_fetch_delay_ms": 1500,
                "rows": 100,
            }
        },
        "sources": [{"description": "cdclog", "endOffset": {"file": "a", "pos": 9}}],
    }
    m = progress_metrics(p)
    assert m["fetchDelayMs"] == 1500
    # batch started 12:00:05, ran 2 s → emit at 12:00:07; newest event
    # 12:00:00 → 7 s event-time-to-emit lag
    assert m["emitDelayMs"] == 7000
    assert m["batchId"] == 7 and m["sources"][0]["description"] == "cdclog"
    # no observation attached → gauges degrade to None, rest intact
    del p["observedMetrics"]
    m2 = progress_metrics(p)
    assert m2["fetchDelayMs"] is None and m2["emitDelayMs"] is None


def test_lag_observer_end_to_end(spark, tmp_path):
    """with_lag_observer rides a real microbatch: observedMetrics carries
    the per-batch max source ts + fetch delay, and progress_metrics turns
    them into gauges."""
    import os

    from flink_cdc_log_connectors_spark.sources.datasource import register
    from flink_cdc_log_connectors_spark.sources.debezium import parse_debezium
    from flink_cdc_log_connectors_spark.streaming.pipeline import (
        progress_metrics,
        with_lag_observer,
    )

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    with open(log_dir / "log-000001.jsonl", "w") as fh:
        for i, (op_ts, emit_ts) in enumerate([(1000, 1400), (2000, 2100)]):
            fh.write(
                json.dumps(
                    {
                        "before": None,
                        "after": {"_id": i, "name": f"n{i}"},
                        "op": "c",
                        "ts_ms": emit_ts,
                        "source": {"db": "d", "table": "t", "ts_ms": op_ts,
                                   "file": "log-000001.jsonl", "pos": i},
                    }
                )
                + "\n"
            )
    register(spark)
    raw = spark.readStream.format("cdclog").option("path", str(log_dir)).load()
    observed = with_lag_observer(parse_debezium(raw, PHYS))
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [
        m for m in (progress_metrics(pp) for pp in q.recentProgress)
        if m.get("numInputRows")
    ]
    assert progresses, "no non-empty batch recorded"
    m = progresses[-1]
    assert m["fetchDelayMs"] == 400  # max(1400-1000, 2100-2000)
    assert m["emitDelayMs"] is not None and m["emitDelayMs"] > 0


def test_as_patterns_brace_commas_not_split():
    from flink_cdc_log_connectors_spark.sources.mongo import _as_patterns

    assert _as_patterns("items_[0-9]{2,3},logs") == ["items_[0-9]{2,3}", "logs"]
    assert _as_patterns("a,b") == ["a", "b"]
    assert _as_patterns("x{1,2},y[,]z") == ["x{1,2}", "y[,]z"]
    assert _as_patterns(None) == []


def test_as_patterns_escapes():
    from flink_cdc_log_connectors_spark.sources.mongo import _as_patterns

    # escaped bracket must not open a depth level (later commas still split)
    assert _as_patterns(r"items_\[x,logs") == [r"items_\[x", "logs"]
    # escaped comma is a literal, never a separator
    assert _as_patterns(r"a\,b,c") == [r"a\,b", "c"]
