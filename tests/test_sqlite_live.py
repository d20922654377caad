"""Live-database dialect (cdcsqlite): the snapshot→log protocol against a
REAL mutating database — P5 watermark capture, P6 backfill merge, and L2
shouldEmit under genuine concurrent writes.

The headline test mirrors the reference's
``MySqlConnectorITCase.testConsumingAllEvents:137-246``: mutate the
database DURING the snapshot and assert exactly-once materialization
(final state equals the database, no event delivered twice).
"""

from __future__ import annotations

import json
import random
import sqlite3
import threading
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.datasource import RAW_SCHEMA
from flink_cdc_log_connectors_spark.sources.debezium import (
    CHANGELOG_ORDER_BY,
    offset_sort_columns,
    parse_debezium,
)
from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
    SqliteCdcStreamReader,
    install_cdc,
    log_position,
    prune_log,
    read_log_between,
    register,
)

PHYSICAL = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.DoubleType()),
    ]
)


def make_db(path: str, n: int = 200) -> str:
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, qty REAL)")
    conn.executemany(
        "INSERT INTO items VALUES (?, ?, ?)",
        [(i, f"item-{i}", float(i % 17)) for i in range(1, n + 1)],
    )
    conn.commit()
    conn.close()
    install_cdc(path, "items")
    return path


def db_state(path: str) -> dict[int, tuple[str, float]]:
    conn = sqlite3.connect(path)
    try:
        return {
            r[0]: (r[1], r[2])
            for r in conn.execute("SELECT id, name, qty FROM items")
        }
    finally:
        conn.close()


def drain_reader(reader: SqliteCdcStreamReader, max_batches: int = 200):
    """Drive the stream-reader API to quiescence; returns (rows, offsets)."""
    rows, offsets = [], []
    cur = reader.initialOffset()
    offsets.append(cur)
    for _ in range(max_batches):
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        offsets.append(cur)
        if not batch and cur.get("phase") == "log":
            break
    return rows, offsets


def materialize(spark, rows) -> dict[int, tuple[str, float]]:
    """Raw (value, file, pos) rows → parse → changelog-apply → {id: row}."""
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    parsed = offset_sort_columns(parse_debezium(df, PHYSICAL))
    final = apply_changelog(parsed, keys=["id"], order_by=CHANGELOG_ORDER_BY)
    return {r["id"]: (r["name"], r["qty"]) for r in final.collect()}


# ---------------------------------------------------------------------------
# watermark capture (P5) — the live log actually moves between captures
# ---------------------------------------------------------------------------


def test_log_position_advances_with_live_writes(tmp_path):
    db = make_db(str(tmp_path / "a.db"), n=10)
    low = log_position(db)
    conn = sqlite3.connect(db)
    conn.execute("UPDATE items SET qty = qty + 1 WHERE id <= 5")
    conn.execute("DELETE FROM items WHERE id = 7")
    conn.commit()
    conn.close()
    high = log_position(db)
    assert low == 0 and high == 6  # 5 updates + 1 delete
    events = read_log_between(db, low, high)
    assert [e[2] for e in events] == ["u"] * 5 + ["d"]
    # before/after images present per op contract (D1)
    assert events[0][3] is not None and events[0][4] is not None  # update: both
    assert events[5][4] is None  # delete: no after image


# ---------------------------------------------------------------------------
# deterministic interleaving: mutations BETWEEN chunk reads (P6 + L2 exact)
# ---------------------------------------------------------------------------


def test_snapshot_with_interleaved_writes_exactly_once(spark, tmp_path):
    db = make_db(str(tmp_path / "b.db"), n=120)
    # budget == chunk size → exactly one chunk per read() call, so the
    # interleaved mutations land deterministically between chunk reads
    reader = SqliteCdcStreamReader(
        {"path": db, "table": "items", "chunksize": "40", "maxeventsperbatch": "40"}
    )
    cur = reader.initialOffset()
    assert cur["phase"] == "snapshot" and len(cur["chunks"]) == 3

    rows = []

    def mutate(sql_stmts):
        conn = sqlite3.connect(db)
        for s in sql_stmts:
            conn.execute(s)
        conn.commit()
        conn.close()

    # chunk 1 ([*, 41)) read; then touch keys in BOTH the finished chunk
    # (must re-emit via log, id > chunk high) and a future chunk (must be
    # merged into that chunk's snapshot read, then suppressed by shouldEmit)
    batch, cur = reader.read(cur)
    rows.extend(batch)
    mutate(
        [
            "UPDATE items SET qty = 999 WHERE id = 5",      # finished chunk
            "UPDATE items SET qty = 888 WHERE id = 100",    # future chunk
            "DELETE FROM items WHERE id = 50",              # future chunk
            "INSERT INTO items VALUES (1000, 'late', 1.0)", # beyond max key
        ]
    )
    batch, cur = reader.read(cur)  # chunk 2 [41, 81)
    rows.extend(batch)
    mutate(["UPDATE items SET name = 'renamed' WHERE id = 60"])  # finished chunk 2
    batch, cur = reader.read(cur)  # chunk 3 [81, *) — includes id=100@888, id=1000
    rows.extend(batch)
    assert cur["phase"] == "log"

    while True:
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        if not batch:
            break

    # exactly-once: no log offset delivered twice
    log_positions = [r[2] for r in rows if json.loads(r[0])["op"] != "r"]
    assert len(log_positions) == len(set(log_positions))
    # the future-chunk update/delete/beyond-max insert were merged into
    # chunk 3's snapshot read and must NOT re-emit from the log (L2)
    emitted_ops = [json.loads(r[0])["op"] for r in rows]
    assert emitted_ops.count("d") == 0  # delete folded into chunk merge
    # the finished-chunk updates MUST re-emit from the log
    log_ids_updated = {
        json.loads(r[0])["after"]["id"] for r in rows if json.loads(r[0])["op"] == "u"
    }
    assert {5, 60} <= log_ids_updated

    assert materialize(spark, rows) == db_state(db)


# ---------------------------------------------------------------------------
# the testConsumingAllEvents analogue: a concurrent writer thread hammers
# the table while the reader snapshots and tails
# ---------------------------------------------------------------------------


def test_concurrent_writer_exactly_once(spark, tmp_path):
    db = make_db(str(tmp_path / "c.db"), n=300)
    stop = threading.Event()
    rng = random.Random(42)

    def writer():
        conn = sqlite3.connect(db, timeout=30.0)
        conn.execute("PRAGMA busy_timeout=30000")
        i = 0
        while not stop.is_set() and i < 400:
            i += 1
            k = rng.randint(1, 300)
            action = rng.random()
            try:
                if action < 0.5:
                    conn.execute(
                        "UPDATE items SET qty = ? WHERE id = ?", (float(i), k)
                    )
                elif action < 0.75:
                    conn.execute("DELETE FROM items WHERE id = ?", (k,))
                else:
                    conn.execute(
                        "INSERT OR REPLACE INTO items VALUES (?, ?, ?)",
                        (k, f"rewritten-{i}", float(i)),
                    )
                conn.commit()
            except sqlite3.OperationalError:
                pass  # lock contention is fine; coverage, not throughput
            time.sleep(0.001)
        conn.close()

    t = threading.Thread(target=writer)
    t.start()
    try:
        reader = SqliteCdcStreamReader(
            {"path": db, "table": "items", "chunksize": "50",
             "maxeventsperbatch": "50"}
        )
        # wait for the writer's first commit so the snapshot genuinely
        # overlaps live traffic, then pace chunk reads inside the write storm
        deadline = time.time() + 10
        while log_position(db) == 0 and time.time() < deadline:
            time.sleep(0.005)
        rows, offsets = [], []
        cur = reader.initialOffset()
        while cur.get("phase") == "snapshot":
            batch, cur = reader.read(cur)
            rows.extend(batch)
            offsets.append(cur)
            time.sleep(0.05)
    finally:
        stop.set()
        t.join()

    # writer stopped: drain the log to quiescence
    while True:
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        if not batch:
            break

    log_positions = [r[2] for r in rows if json.loads(r[0])["op"] != "r"]
    assert len(log_positions) == len(set(log_positions)), "event delivered twice"
    assert materialize(spark, rows) == db_state(db)
    # P5 watermarks really moved DURING the snapshot: later chunks saw a
    # higher log position than the first (concurrent commits in between)
    highs = next(o for o in offsets if o.get("phase") == "log")["chunk_highs"]
    assert highs == sorted(highs) and highs[-1] > highs[0]


# ---------------------------------------------------------------------------
# failover: resume from a committed mid-snapshot offset (P8/C3/C4)
# ---------------------------------------------------------------------------


def test_restart_mid_snapshot_resumes_consistent(spark, tmp_path):
    db = make_db(str(tmp_path / "d.db"), n=100)
    opts = {"path": db, "table": "items", "chunksize": "30",
            "maxeventsperbatch": "30"}
    r1 = SqliteCdcStreamReader(opts)
    rows = []
    cur = r1.initialOffset()
    batch, cur = r1.read(cur)  # chunk 1 only
    rows.extend(batch)
    committed = cur  # ≈ SS offset log entry

    # crash; writes land while we're down
    conn = sqlite3.connect(db)
    conn.execute("UPDATE items SET qty = -1 WHERE id IN (10, 55, 90)")
    conn.execute("DELETE FROM items WHERE id = 20")
    conn.commit()
    conn.close()

    # new reader instance resumes from the committed offset
    r2 = SqliteCdcStreamReader(opts)
    cur = committed
    while True:
        batch, cur = r2.read(cur)
        batch = list(batch)
        rows.extend(batch)
        if not batch and cur.get("phase") == "log":
            break

    # id=10 was in the already-emitted chunk 1: its update arrives via the
    # log (id > chunk1 high). id=55/90 were in pending chunks: merged there.
    assert materialize(spark, rows) == db_state(db)


# ---------------------------------------------------------------------------
# end-to-end through Structured Streaming (format("cdcsqlite"))
# ---------------------------------------------------------------------------


def test_structured_streaming_end_to_end(spark, tmp_path):
    db = make_db(str(tmp_path / "e.db"), n=80)
    # pre-position some log events so the stream has both phases to serve
    conn = sqlite3.connect(db)
    conn.execute("UPDATE items SET qty = 3.5 WHERE id <= 10")
    conn.execute("DELETE FROM items WHERE id = 42")
    conn.commit()
    conn.close()

    register(spark)
    raw = (
        spark.readStream.format("cdcsqlite")
        .option("path", db)
        .option("table", "items")
        .option("chunkSize", "25")
        .load()
    )
    parsed = offset_sort_columns(parse_debezium(raw, PHYSICAL))
    out = str(tmp_path / "sink")
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sunk = spark.read.parquet(out)
    final = apply_changelog(sunk, keys=["id"], order_by=CHANGELOG_ORDER_BY)
    got = {r["id"]: (r["name"], r["qty"]) for r in final.collect()}
    assert got == db_state(db)
    # the deleted key is gone, the updates are reflected
    assert 42 not in got
    assert got[5] == ("item-5", 3.5)


def test_batch_reader_chunk_partitions(spark, tmp_path):
    db = make_db(str(tmp_path / "f.db"), n=90)
    conn = sqlite3.connect(db)
    conn.execute("UPDATE items SET name = 'x' WHERE id = 33")
    conn.commit()
    conn.close()
    register(spark)
    raw = (
        spark.read.format("cdcsqlite")
        .option("path", db)
        .option("table", "items")
        .option("chunkSize", "30")
        .load()
    )
    parsed = offset_sort_columns(parse_debezium(raw, PHYSICAL))
    final = apply_changelog(parsed, keys=["id"], order_by=CHANGELOG_ORDER_BY)
    got = {r["id"]: (r["name"], r["qty"]) for r in final.collect()}
    assert got == db_state(db)
    assert got[33][0] == "x"


def test_prune_log_retention(tmp_path):
    db = make_db(str(tmp_path / "g.db"), n=5)
    conn = sqlite3.connect(db)
    for i in range(1, 6):
        conn.execute("UPDATE items SET qty = ? WHERE id = ?", (float(i), i))
    conn.commit()
    conn.close()
    assert log_position(db) == 5
    assert prune_log(db, 3) == 3
    remaining = read_log_between(db, 0)
    assert [e[0] for e in remaining] == [4, 5]


# ---------------------------------------------------------------------------
# §2.8 option parity: connect.timeout / pool size / retries / chunk-meta
# ---------------------------------------------------------------------------


def test_chunk_meta_group_size_compacts_offset(spark, tmp_path):
    """Past the group-size threshold the offset JSON stores the even-split
    plan as an O(1) arithmetic descriptor (the reference's
    chunk-meta.group.size bounds checkpoint state the same way), and the
    stream still materializes exactly-once from the compact form."""
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        decode_chunks,
        encode_chunks,
    )
    from flink_cdc_log_connectors_spark.sources.chunking import ChunkRange

    # roundtrip: uniform plan → descriptor → identical ranges
    plan = [ChunkRange(i * 10, (i + 1) * 10) for i in range(50)]
    plan[-1] = ChunkRange(490, None)  # unbounded tail, as split_even emits
    enc = encode_chunks(plan, group_size=8)
    assert isinstance(enc, dict) and enc["n"] == 50
    assert decode_chunks(enc) == [[c.start, c.end] for c in plan]
    # below threshold stays explicit
    assert isinstance(encode_chunks(plan, group_size=100), list)

    db = make_db(str(tmp_path / "cm.db"), n=120)
    reader = SqliteCdcStreamReader(
        {"path": db, "table": "items", "chunksize": "10",
         "maxeventsperbatch": "30", "chunkmetagroupsize": "4"}
    )
    cur = reader.initialOffset()
    assert isinstance(cur["chunks"], dict)  # 12 chunks > group size 4
    rows, offsets = [], [cur]
    while True:
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        offsets.append(cur)
        if not batch and cur.get("phase") == "log":
            break
    assert materialize(spark, rows) == db_state(db)
    # every snapshot-phase offset carried the compact descriptor
    snap_offs = [o for o in offsets if o.get("phase") == "snapshot"]
    assert snap_offs and all(isinstance(o["chunks"], dict) for o in snap_offs)


def test_connection_options_honored(tmp_path):
    """connectTimeout lands in the pooled connection's busy_timeout; the
    per-db pool only evicts connections of DEAD threads past the cap."""
    import threading

    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        _POOL,
        SqliteCdcStreamReader,
        _connect,
        close_pool,
        configure_connection,
    )

    db = make_db(str(tmp_path / "opt.db"), n=5)
    close_pool(db)
    SqliteCdcStreamReader(
        {"path": db, "table": "items", "connecttimeout": "7",
         "connectmaxretries": "2", "connectionpoolsize": "1"}
    )
    conn = _connect(db)
    assert conn.execute("PRAGMA busy_timeout").fetchone()[0] == 7000

    # spawn threads that each open a pooled connection, then die
    def open_conn():
        _connect(db).execute("SELECT 1").fetchone()

    for _ in range(3):
        t = threading.Thread(target=open_conn)
        t.start()
        t.join()
    # next connect evicts dead threads' connections down to the cap
    _connect(db)
    mine = [k for k in _POOL if k[0] == db]
    alive = {t.ident for t in threading.enumerate()}
    assert all(k[1] in alive for k in mine)  # no dead-thread conns retained
    close_pool(db)


def test_option_validation_rejects_bad_ranges(tmp_path):
    import pytest as _pytest

    from flink_cdc_log_connectors_spark.sources.validators import (
        ValidationError,
        validate_sqlite_dialect,
    )

    db = make_db(str(tmp_path / "val.db"), n=5)
    with _pytest.raises(ValidationError) as ei:
        validate_sqlite_dialect(
            {"path": db, "table": "items", "connecttimeout": "0",
             "connectionpoolsize": "-2", "chunkmetagroupsize": "abc"}
        )
    msg = str(ei.value)
    assert "connectTimeout" in msg
    assert "connectionPoolSize" in msg
    assert "chunkMetaGroupSize" in msg
    # heartbeatInterval=0 means disabled — allowed
    validate_sqlite_dialect({"path": db, "table": "items", "heartbeatinterval": "0"})


# ---------------------------------------------------------------------------
# L6 on the live dialect: schema drift → DDL side channel → evolution plan
# ---------------------------------------------------------------------------


def test_live_schema_change_detection(spark, tmp_path):
    """ALTER TABLE between batches: the reader emits a synthesized DDL
    envelope (pinned-offset vs live signature), schema_change_events
    surfaces it, plan_schema_evolution classifies it as a safe widen, and
    the widened schema parses subsequent rows including the new column."""
    from flink_cdc_log_connectors_spark.sources.debezium import (
        parse_debezium,
        schema_change_events,
        plan_schema_evolution,
    )
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        physical_schema,
        schema_drift_event,
        table_schema_signature,
    )

    db = make_db(str(tmp_path / "l6.db"), n=20)
    opts = {"path": db, "table": "items", "chunksize": "50",
            "maxeventsperbatch": "50", "includeschemachanges": "true"}
    reader = SqliteCdcStreamReader(opts)
    cur = reader.initialOffset()
    assert cur["schema_sig"] == table_schema_signature(db, "items")
    old_phys = physical_schema(db, "items")

    rows = []
    batch, cur = reader.read(cur)  # snapshot, no drift
    rows.extend(batch)
    assert not any("ddl" in json.loads(r[0]) for r in rows)

    conn = sqlite3.connect(db)
    conn.execute("ALTER TABLE items ADD COLUMN note TEXT")
    conn.commit()
    conn.close()

    batch, cur = reader.read(cur)  # detects drift, refreshes capture
    batch = list(batch)
    # post-refresh events capture the new column
    conn = sqlite3.connect(db)
    conn.execute("INSERT INTO items VALUES (999, 'with-note', 1.0, 'hello')")
    conn.commit()
    conn.close()
    more, cur = reader.read(cur)
    batch = batch + list(more)
    ddl_raw = [r for r in batch if "ddl" in json.loads(r[0])]
    assert len(ddl_raw) == 1
    assert "ADD COLUMN note TEXT" in json.loads(ddl_raw[0][0])["ddl"]
    assert cur["schema_sig"] == table_schema_signature(db, "items")

    # side channel parses it; data path ignores it
    df = spark.createDataFrame(batch, RAW_SCHEMA)
    events = schema_change_events(df).collect()
    assert len(events) == 1 and events[0]["table_name"] == "items"

    # evolution policy: pure column addition → restart with widened schema
    new_phys = physical_schema(db, "items")
    plan = plan_schema_evolution(old_phys, new_phys)
    assert plan["action"] == "restart_widened"
    assert any(c.startswith("add:note") for c in plan["changes"])

    # widened schema parses the post-DDL insert including the new column
    parsed = parse_debezium(df, plan["schema"])
    note_rows = [r for r in parsed.collect() if r["id"] == 999]
    assert note_rows and note_rows[0]["note"] == "hello"

    # a second read with no further drift emits no duplicate DDL event
    batch2, cur = reader.read(cur)
    assert not any("ddl" in json.loads(r[0]) for r in batch2)

    # replay determinism: the drift event is a pure function of the
    # pinned/current signature pair
    e1, _ = schema_drift_event(db, "items", ["id:INTEGER", "name:TEXT", "qty:REAL"])
    e2, _ = schema_drift_event(db, "items", ["id:INTEGER", "name:TEXT", "qty:REAL"])
    assert e1 == e2 and e1 is not None


def test_reinstall_capture_loses_no_events_under_writer(tmp_path):
    """Trigger refresh must never open a capture gap: a writer hammering
    inserts while reinstall_capture runs repeatedly ends with exactly one
    log row per committed insert (the one-transaction BEGIN IMMEDIATE
    refresh; a two-transaction drop→recreate loses whatever commits in
    between)."""
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        reinstall_capture,
    )

    path = make_db(str(tmp_path / "r.db"), n=10)
    stop = threading.Event()
    written = []

    def writer():
        conn = sqlite3.connect(path, timeout=30)
        i = 1000
        while not stop.is_set():
            conn.execute(
                "INSERT INTO items VALUES (?, ?, ?)", (i, f"w-{i}", 1.0)
            )
            conn.commit()
            written.append(i)
            i += 1
        conn.close()

    th = threading.Thread(target=writer)
    th.start()
    try:
        for _ in range(25):
            reinstall_capture(path, "items")
            time.sleep(0.002)
    finally:
        stop.set()
        th.join()

    conn = sqlite3.connect(path)
    log_inserts = conn.execute(
        "SELECT COUNT(*) FROM _cdc_log WHERE op = 'c'"
    ).fetchone()[0]
    conn.close()
    assert log_inserts == len(written), (
        f"capture gap: {len(written)} committed inserts, "
        f"{log_inserts} captured"
    )
    assert len(written) > 10  # the writer actually ran concurrently


def test_huge_split_count_exactly_once(spark, tmp_path):
    """Reference `testBigTableWithHugeSplits` analog: hundreds of tiny
    chunks (chunkSize=2 over 400 rows → 200 snapshot chunks) with a
    mutation landing mid-snapshot — chunk merge, per-chunk watermarks,
    and the log handoff stay exactly-once at split counts two orders of
    magnitude above the default, and the offset stays serializable."""
    import json as _json

    db = make_db(str(tmp_path / "huge.db"), n=400)
    reader = SqliteCdcStreamReader(
        {"path": db, "table": "items", "chunksize": "2",
         "maxeventsperbatch": "50"}
    )
    rows = []
    cur = reader.initialOffset()
    mutated = False
    while cur.get("phase") == "snapshot":
        batch, cur = reader.read(cur)
        rows.extend(batch)
        if not mutated and len(rows) >= 120:
            # mid-snapshot mutation: already-read chunk 1's key changes
            conn = sqlite3.connect(db)
            conn.execute("UPDATE items SET qty = 777.0 WHERE id = 1")
            conn.execute("DELETE FROM items WHERE id = 399")
            conn.commit()
            conn.close()
            mutated = True
    assert mutated, "snapshot finished before the mutation landed"
    # the plan really had ~200 chunks and the offset stays serializable
    # (chunk-meta grouping may compact the plan; highs list when explicit)
    highs = cur.get("chunk_highs")
    if highs is not None:
        assert len(highs) >= 190
    _json.dumps(cur)
    while True:
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        if not batch:
            break
    state = materialize(spark, rows)
    assert state == db_state(db)
    assert state[1][1] == 777.0 and 399 not in state
    log_positions = [r[2] for r in rows if json.loads(r[0])["op"] != "r"]
    assert len(log_positions) == len(set(log_positions))
