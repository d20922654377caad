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
    from flink_cdc_log_connectors_spark.streaming.statetable import read_state

    state = read_state(spark, out_path, keys=["id"])
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


def test_enrich_stream_static_broadcast(spark, tmp_path):
    from flink_cdc_log_connectors_spark.streaming.pipeline import enrich_stream

    rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "zz", 30.0)]
    src = spark.createDataFrame(rows, "id int, dim_key string, v double")
    path = str(tmp_path / "enrich_parquet")
    src.repartition(1).write.parquet(path)
    dim = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], "dim_key string, dim_name string"
    )
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = enrich_stream(stream, dim, ["dim_key"])
    q = (
        out.writeStream.format("memory")
        .queryName("enr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "enr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["dim_name"]
        for r in spark.sql("SELECT id, dim_name FROM enr_out").collect()
    }
    # left join: unmatched key surfaces with NULL dim, row is NOT dropped
    assert got == {1: "Alpha", 2: "Beta", 3: None}


def test_interval_join_stream_stream(spark, tmp_path):
    from flink_cdc_log_connectors_spark.streaming.pipeline import interval_join

    orders_rows = [
        ("2024-01-01 10:00:00", "k1", 100),
        ("2024-01-01 11:00:00", "k2", 200),
    ]
    ship_rows = [
        ("2024-01-01 10:04:00", "k1", "S-in-window"),
        ("2024-01-01 10:30:00", "k1", "S-too-late"),   # > upper bound (5 min)
        ("2024-01-01 10:59:00", "k2", "S-before-order"),  # violates lower bound
        ("2024-01-01 11:02:00", "k2", "S-in-window"),
    ]
    op = str(tmp_path / "iv_orders")
    sp = str(tmp_path / "iv_ships")
    odf = spark.createDataFrame(orders_rows, "ts_s string, k string, amt int").withColumn(
        "ots", F.col("ts_s").cast("timestamp")
    ).drop("ts_s")
    sdf = spark.createDataFrame(ship_rows, "ts_s string, k string, tag string").withColumn(
        "sts", F.col("ts_s").cast("timestamp")
    ).drop("ts_s")
    odf.repartition(1).write.parquet(op)
    sdf.repartition(1).write.parquet(sp)
    left = spark.readStream.schema(odf.schema).parquet(op)
    right = spark.readStream.schema(sdf.schema).parquet(sp)
    joined = interval_join(
        left, right, key="k", left_ts="ots", right_ts="sts",
        lower="0 seconds", upper="5 minutes", watermark="10 minutes",
    ).select(F.col("l.k").alias("k"), "amt", "tag")
    q = (
        joined.writeStream.format("memory")
        .queryName("iv_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "iv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["amt"], r["tag"])
        for r in spark.sql("SELECT * FROM iv_out").collect()
    )
    # only ship events within [order_ts, order_ts + 5 min] match
    assert got == [("k1", 100, "S-in-window"), ("k2", 200, "S-in-window")]


def test_fanout_by_table_whole_database_capture(spark, tmp_path):
    """One stream carrying two tables → two materialized state tables in a
    single foreachBatch pass (whole-database capture)."""
    import json

    from flink_cdc_log_connectors_spark.streaming.pipeline import fanout_by_table
    from flink_cdc_log_connectors_spark.sources.debezium import (
        CHANGELOG_ORDER_BY,
        offset_sort_columns,
    )

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    envs = []
    for i, (table, op, after) in enumerate(
        [
            ("products", "c", {"id": 1, "name": "a", "weight": 1.0}),
            ("orders_t", "c", {"id": 1, "name": "o1", "weight": 5.0}),
            ("products", "u", {"id": 1, "name": "a2", "weight": 2.0}),
            ("orders_t", "d", None),
        ]
    ):
        before = {"id": 1, "name": "x", "weight": 0.0} if op in ("u", "d") else None
        envs.append(json.dumps({
            "before": before, "after": after, "op": op,
            "ts_ms": 1_700_000_000_000 + i,
            "source": {"db": "inv", "table": table,
                       "ts_ms": 1_700_000_000_000 + i,
                       "file": "binlog.000000", "pos": i},
        }))
    (log_dir / "log-000000.jsonl").write_text("\n".join(envs) + "\n")

    stream = read_cdc_stream(spark, str(tmp_path), PRODUCTS_PHYSICAL,
                             starting_offsets="earliest")
    q = (
        fanout_by_table(
            offset_sort_columns(stream),
            output_base=str(tmp_path / "state"),
            checkpoint_path=str(tmp_path / "fo_ckpt"),
            keys=["id"],
            order_by=CHANGELOG_ORDER_BY,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from flink_cdc_log_connectors_spark.streaming.statetable import read_state

    products = read_state(spark, str(tmp_path / "state" / "products"), ["id"]).collect()
    assert {(r["id"], r["name"], r["weight"]) for r in products} == {(1, "a2", 2.0)}
    # orders_t: create then delete → empty state (no live buckets)
    orders = read_state(spark, str(tmp_path / "state" / "orders_t"), ["id"])
    assert orders is None or orders.count() == 0


def test_partitioned_state_table_batch_proportional(spark, tmp_path):
    """Upserting one key rewrites ONLY that key's bucket: every other
    bucket's version (and its files) stays untouched — the per-batch work
    is proportional to the batch, not the state."""
    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(str(tmp_path / "st"), ["id"], n_buckets=8)
    b0 = spark.createDataFrame(
        [(i, float(i), "c") for i in range(20)], "id int, v double, op string"
    )
    t.upsert(b0, order_by=["v"], epoch_id=0)
    # bucket entries only — the manifest also carries __-prefixed
    # bookkeeping (e.g. the stored file schema, r12)
    m0 = dict(t._bucket_items(t.load_manifest()))
    assert set(m0.values()) == {0} and len(m0) >= 2

    t.upsert(
        spark.createDataFrame([(3, 99.0, "u")], "id int, v double, op string"),
        order_by=["v"],
        epoch_id=1,
    )
    m1 = dict(t._bucket_items(t.load_manifest()))
    changed = {b for b in set(m0) | set(m1) if m0.get(b) != m1.get(b)}
    assert len(changed) == 1  # exactly the bucket key 3 hashes into
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 20 and got[3] == 99.0 and got[5] == 5.0

    # delete drops the key from state
    t.upsert(
        spark.createDataFrame([(3, None, "d")], "id int, v double, op string"),
        order_by=["v"],
        epoch_id=2,
    )
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 19 and 3 not in got


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    from flink_cdc_log_connectors_spark.streaming.pipeline import interval_join

    o_rows = [("2024-01-01 10:00:00", "k1", 1), ("2024-01-01 10:00:00", "k2", 2)]
    s_rows = [("2024-01-01 10:02:00", "k1", "hit"),
              ("2024-01-01 12:00:00", "k1", "wm-advance")]  # advances watermark
    op, sp = str(tmp_path / "oj_o"), str(tmp_path / "oj_s")
    odf = spark.createDataFrame(o_rows, "ts_s string, k string, amt int").withColumn(
        "ots", F.col("ts_s").cast("timestamp")).drop("ts_s")
    sdf = spark.createDataFrame(s_rows, "ts_s string, k string, tag string").withColumn(
        "sts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    odf.repartition(1).write.parquet(op)
    sdf.repartition(1).write.parquet(sp)
    left = spark.readStream.schema(odf.schema).parquet(op)
    right = spark.readStream.schema(sdf.schema).parquet(sp)
    joined = interval_join(
        left, right, key="k", left_ts="ots", right_ts="sts",
        lower="0 seconds", upper="5 minutes", watermark="10 minutes",
        how="leftOuter",
    ).select(F.col("l.k").alias("k"), "amt", "tag")
    rows: list = []

    def run():
        q = (
            joined.writeStream.foreachBatch(lambda b, _e: rows.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "oj_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # outer results finalize only when a LATER BATCH advances the watermark
    # past the unmatched row's join window — append a fresh far-future row
    # (an empty batch would advance nothing: no data, no batch)
    # (the global watermark is the MIN across sources, so BOTH sides
    # must see later event times)
    more_r = spark.createDataFrame(
        [("2024-01-01 14:00:00", "k9", "wm-advance-2")],
        "ts_s string, k string, tag string",
    ).withColumn("sts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    more_r.repartition(1).write.mode("append").parquet(sp)
    more_l = spark.createDataFrame(
        [("2024-01-01 14:00:00", "k9", 0)],
        "ts_s string, k string, amt int",
    ).withColumn("ots", F.col("ts_s").cast("timestamp")).drop("ts_s")
    more_l.repartition(1).write.mode("append").parquet(op)
    run()
    run()  # one more trigger to flush state evicted by the advanced watermark
    got = sorted((r["k"], r["amt"], r["tag"]) for r in rows)
    assert ("k1", 1, "hit") in got
    assert ("k2", 2, None) in got      # unmatched left emitted with NULL


def test_streaming_minhash_dedup_across_batches(spark, tmp_path):
    """Ingestion dedup: a doc arriving in a LATER microbatch is caught
    against the accumulated index, not just its own batch."""
    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        read_dedup_pairs,
        streaming_minhash_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    near = base.replace("warm", "cold")  # near-dup of doc 1
    other = (
        "completely different content about distributed query engines and "
        "partitioned state tables with atomic manifest swaps for streams"
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    idx = str(tmp_path / "index")

    schema = "doc_id long, text string"
    # batch 1: two distinct docs + an intra-batch near-dup pair (3≈1)
    spark.createDataFrame(
        [(1, base), (2, other), (3, near)], schema
    ).repartition(1).write.mode("append").parquet(str(in_dir))
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    q = streaming_minhash_dedup(
        stream, idx, str(tmp_path / "ckpt"), threshold_num=1, threshold_den=2
    ).start()
    q.processAllAvailable()

    got1 = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (1, 3) in got1

    # batch 2: another copy of base → must pair with BOTH 1 and 3 from
    # the index (cross-batch), not just within its own batch
    spark.createDataFrame([(9, base)], schema).repartition(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    got2 = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (9, 1) in got2 and (9, 3) in got2
    assert (9, 2) not in got2 and (1, 2) not in got1


def test_state_table_time_travel_reads(spark, tmp_path):
    """retain_versions > 0: read_at reconstructs the view AS OF any
    retained commit; expired epochs raise instead of silently serving a
    newer view; GC never deletes a bucket version a retained manifest
    still references."""
    import pytest

    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(
        str(tmp_path / "tt"), ["id"], n_buckets=4, retain_versions=2
    )

    def put(rows, epoch):
        t.upsert(
            spark.createDataFrame(rows, "id int, v double, op string"),
            order_by=["v"],
            epoch_id=epoch,
        )

    put([(1, 1.0, "c"), (2, 2.0, "c")], 0)
    put([(1, 10.0, "u")], 1)
    put([(2, None, "d"), (3, 3.0, "c")], 2)

    def snap(df):
        return {} if df is None else {r["id"]: r["v"] for r in df.collect()}

    assert snap(t.read_at(spark, 0)) == {1: 1.0, 2: 2.0}
    assert snap(t.read_at(spark, 1)) == {1: 10.0, 2: 2.0}
    assert snap(t.read_at(spark, 2)) == snap(t.read(spark)) == {1: 10.0, 3: 3.0}
    # an epoch between commits resolves to the latest at-or-before commit
    put([(4, 4.0, "c")], 5)
    assert snap(t.read_at(spark, 4)) == {1: 10.0, 3: 3.0}
    # retention window is 2 past commits: epoch 0 has expired
    with pytest.raises(ValueError, match="retention window"):
        t.read_at(spark, 0)


def test_state_table_time_travel_replay_idempotent(spark, tmp_path):
    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(
        str(tmp_path / "ttr"), ["id"], n_buckets=4, retain_versions=3
    )

    def put(rows, epoch):
        t.upsert(
            spark.createDataFrame(rows, "id int, v double, op string"),
            order_by=["v"],
            epoch_id=epoch,
        )

    put([(1, 1.0, "c")], 0)
    put([(1, 2.0, "u")], 1)
    put([(1, 2.0, "u")], 1)  # crash-retry replay of the same epoch
    hist = t.load_history()
    assert [h["epoch"] for h in hist] == [0, 1]  # no duplicate entry
    assert {r["id"]: r["v"] for r in t.read_at(spark, 0).collect()} == {1: 1.0}
    assert {r["id"]: r["v"] for r in t.read(spark).collect()} == {1: 2.0}


def test_state_table_no_retention_unchanged(spark, tmp_path):
    """Default retain_versions=0 writes no history file at all."""
    import os

    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(str(tmp_path / "nr"), ["id"], n_buckets=4)
    t.upsert(
        spark.createDataFrame([(1, 1.0, "c")], "id int, v double, op string"),
        order_by=["v"],
        epoch_id=0,
    )
    assert not os.path.exists(str(tmp_path / "nr" / "_history.json"))


# ---------------------------------------------------------------------------
# append-only state tables (r7): insert-only commit mode for version
# histories — O(batch) writes, manifest maps bucket → version LIST
# ---------------------------------------------------------------------------


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_statetable_append_accumulates_and_replays_idempotently(spark, tmp_path):
    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(str(tmp_path / "h"), ["k"], n_buckets=4)
    t.append(_df(spark, [(1, "a"), (2, "b")]), epoch_id=0)
    t.append(_df(spark, [(1, "a2"), (3, "c")]), epoch_id=1)
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    # append-only: BOTH versions of k=1 are retained (a version history)
    assert got == {(1, "a"), (2, "b"), (1, "a2"), (3, "c")}
    # a replayed epoch overwrites its own version — no duplicates
    t.append(_df(spark, [(1, "a2"), (3, "c")]), epoch_id=1)
    got = {(r["k"], r["v"], r["__epoch"]) for r in t.read(spark).collect()}
    assert got == {(1, "a", 0), (2, "b", 0), (1, "a2", 1), (3, "c", 1)}
    assert t.read(spark).count() == 4
    # empty appends commit nothing
    t.append(_df(spark, []), epoch_id=2)
    assert t.read(spark).count() == 4


def test_statetable_append_upsert_mode_mixing_refused(spark, tmp_path):
    import pytest

    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    a = PartitionedStateTable(str(tmp_path / "a"), ["k"], n_buckets=2)
    a.append(_df(spark, [(1, "x")]), epoch_id=0)
    with pytest.raises(ValueError, match="append-managed"):
        a.upsert(
            _df(spark, [(1, "y")]).withColumn("op", F.lit("c")),
            order_by=["v"],
            epoch_id=1,
        )
    u = PartitionedStateTable(str(tmp_path / "u"), ["k"], n_buckets=2)
    u.upsert(
        _df(spark, [(1, "x")]).withColumn("op", F.lit("c")),
        order_by=["v"],
        epoch_id=0,
    )
    with pytest.raises(ValueError, match="upsert"):
        u.append(_df(spark, [(2, "y")]), epoch_id=1)


def test_statetable_append_compact_preserves_rows_and_gcs(spark, tmp_path):
    import glob
    import pytest

    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    t = PartitionedStateTable(str(tmp_path / "c"), ["k"], n_buckets=2)
    for e in range(4):
        t.append(_df(spark, [(e, f"v{e}"), (e + 100, f"w{e}")]), epoch_id=e)
    before = {(r["k"], r["v"], r["__epoch"]) for r in t.read(spark).collect()}
    n_files_before = len(glob.glob(str(tmp_path / "c" / "_data" / "v=*")))
    assert n_files_before == 4
    # compaction versions are NAMESPACED (v=c<id>): compacting under a
    # live APPEND epoch id cannot collide with (and destroy) that
    # epoch's files — the id below is fine even though epoch 3 is live
    t.compact(spark, epoch_id=3)
    after = {(r["k"], r["v"], r["__epoch"]) for r in t.read(spark).collect()}
    assert after == before  # rows and original epoch stamps preserved
    assert glob.glob(str(tmp_path / "c" / "_data" / "v=*")) == [
        str(tmp_path / "c" / "_data" / "v=c3")
    ]
    # re-compacting a still-referenced compaction id is refused
    with pytest.raises(ValueError, match="referenced"):
        t.compact(spark, epoch_id=3)
    # a REPLAY of a compacted epoch is a no-op (its rows already live in
    # the compacted version — re-appending would duplicate; pre-fix the
    # shared version namespace even DESTROYED the compacted v=3 files)
    t.append(_df(spark, [(3, "v3"), (103, "w3")]), epoch_id=3)
    assert {(r["k"], r["v"], r["__epoch"]) for r in t.read(spark).collect()} \
        == before
    # fresh epochs continue normally after a compact
    t.append(_df(spark, [(7, "z")]), epoch_id=100)
    assert t.read(spark).count() == 9


def _ingest_doc_sets(spark, rows):
    from flink_cdc_log_connectors_spark.functions.text import hashed_word_ngrams
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", hashed_word_ngrams(F.col("text"), 3).alias("shset")
    )


_ING_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
_ING_OTHER = (
    "completely different content about distributed query engines and "
    "partitioned state tables with atomic manifest swaps for streams"
)


def test_ingest_dedup_recovers_bands_ahead_of_shsets(spark, tmp_path):
    """REGRESSION (ADVICE r8): a crash between the bands and shsets
    appends left the band index AHEAD of the set store; the retry then
    called .select() on shsets.read()'s None and wedged the stream
    forever.  The pruned read now tolerates the missing store (and the
    append order was flipped so the fixed code can no longer produce
    this state — only a pre-fix crash can)."""
    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        IngestDedup,
        _batch_bands,
        read_dedup_pairs,
    )

    idx = str(tmp_path / "idx")
    dd = IngestDedup(idx, threshold_num=1, threshold_den=2)
    # simulate the pre-fix crash: epoch 0's bands committed, shsets not
    dd.bands.append(
        _batch_bands(_ingest_doc_sets(spark, [(1, _ING_BASE)])), epoch_id=0
    )
    # epoch 1 carries an intra-batch near-dup pair; pre-fix this raised
    # AttributeError on every retry
    dd.process_batch(
        spark.createDataFrame(
            [(5, _ING_BASE.replace("warm", "cold")), (6, _ING_BASE), (7, _ING_OTHER)],
            "doc_id long, text string",
        ),
        epoch_id=1,
    )
    got = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (5, 6) in got  # intra-batch verification still ran
    # doc 1's pairs are unrecoverable (its shingle sets died in the
    # crash) — but the stream is live again and future epochs dedup fine
    dd.process_batch(
        spark.createDataFrame([(9, _ING_BASE)], "doc_id long, text string"),
        epoch_id=2,
    )
    got = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (9, 5) in got and (9, 6) in got


def test_migrate_raw_pre_r8_ingest_index(spark, tmp_path):
    """migrate_ingest_index on the pre-r8 RAW layout (plain mode-append
    parquet dirs, at-least-once duplicates, pairs carrying an `epoch`
    column): one shot in place, then the stream resumes against the
    migrated index — old docs stay probe-able and old pairs stay read."""
    import os

    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        IngestDedup,
        _batch_bands,
        migrate_ingest_index,
        read_dedup_pairs,
    )
    from pyspark.sql import functions as F

    idx = str(tmp_path / "idx")
    doc_sets = _ingest_doc_sets(spark, [(1, _ING_BASE), (2, _ING_OTHER)])
    bands = _batch_bands(doc_sets)
    # the old loop's exact writes — including a duplicate append (the
    # old layout was at-least-once, deduped on read)
    for _ in range(2):
        bands.write.mode("append").parquet(os.path.join(idx, "bands"))
        doc_sets.write.mode("append").parquet(os.path.join(idx, "shsets"))
    spark.createDataFrame(
        [(101, 100, 0.8, 3), (101, 100, 0.8, 3)],
        "d1 long, d2 long, jaccard double, epoch long",
    ).write.mode("append").parquet(os.path.join(idx, "pairs"))

    migrated = migrate_ingest_index(spark, idx)
    assert migrated == {"bands": True, "shsets": True, "pairs": True}
    # migrated pairs read back exactly once, legacy epoch column gone
    pairs = read_dedup_pairs(spark, idx)
    assert [tuple(r) for r in pairs.collect()] == [(101, 100, 0.8)]
    # resume the stream: a new near-dup of migrated doc 1 pairs with it
    dd = IngestDedup(idx, threshold_num=1, threshold_den=2)
    dd.process_batch(
        spark.createDataFrame(
            [(9, _ING_BASE)],
            "doc_id long, text string",
        ),
        epoch_id=1,
    )
    got = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (9, 1) in got and (101, 100) in got
    # idempotent: a second run migrates nothing
    assert migrate_ingest_index(spark, idx) == {
        "bands": False,
        "shsets": False,
        "pairs": False,
    }


def test_migrate_r8_doc_id_bucketed_bands(spark, tmp_path):
    """migrate_ingest_index on an r8-era index (state tables, but bands
    bucketed by doc_id): re-places bands by (band_idx, bh) preserving the
    per-row __epoch stamps, stamps __folded_max so a replayed append of a
    migrated epoch no-ops, and leaves the already-current stores alone."""
    import os

    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        IngestDedup,
        _batch_bands,
        migrate_ingest_index,
        read_dedup_pairs,
    )
    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    idx = str(tmp_path / "idx")
    doc_sets = _ingest_doc_sets(spark, [(1, _ING_BASE), (2, _ING_OTHER)])
    bands = _batch_bands(doc_sets)
    # the r8 layout: bands bucketed by its merge key
    old_bands = PartitionedStateTable(
        os.path.join(idx, "bands"), ["doc_id"], n_buckets=16
    )
    old_bands.append(bands, epoch_id=0)
    # shsets/pairs already had the current layout in r8
    shsets = PartitionedStateTable(
        os.path.join(idx, "shsets"), ["doc_id"], n_buckets=16
    )
    shsets.append(doc_sets, epoch_id=0)

    # the current loop refuses the old layout loudly (never prunes blind)
    dd_refused = IngestDedup(idx)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket layout"):
        dd_refused.process_batch(
            spark.createDataFrame([(9, _ING_BASE)], "doc_id long, text string"),
            epoch_id=1,
        )

    migrated = migrate_ingest_index(spark, idx)
    assert migrated == {"bands": True, "shsets": False, "pairs": False}
    dd = IngestDedup(idx, threshold_num=1, threshold_den=2)
    # __epoch stamps survived: a replayed append of migrated epoch 0
    # no-ops via the __folded_max watermark
    dd.bands.append(bands, epoch_id=0)
    assert dd.bands.read(spark).count() == bands.count()
    # and the resumed stream probes migrated docs through pruned reads
    dd.process_batch(
        spark.createDataFrame(
            [(9, _ING_BASE)],
            "doc_id long, text string",
        ),
        epoch_id=1,
    )
    got = {(r["d1"], r["d2"]) for r in read_dedup_pairs(spark, idx).collect()}
    assert (9, 1) in got and (9, 2) not in got
