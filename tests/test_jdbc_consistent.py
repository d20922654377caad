"""P5/P6 on the generic JDBC path, proven LIVE: a Derby table is mutated
while ``read_snapshot_consistent`` runs, and the per-chunk watermark
bracketing + backfill merge must deliver exactly-once materialization —
the JDBC twin of ``test_sqlite_live.py`` (reference
``MySqlConnectorITCase.testConsumingAllEvents:137-246``,
``SnapshotSplitReader.java:118-137``).

Derby is embedded in the Spark JVM, so plain JDBC triggers give us a live
trigger-based audit log (same capture pattern as the sqlite dialect), and
mutations through ``java.sql.DriverManager`` are visible to the very same
database instance the chunk reads hit.
"""

from __future__ import annotations

import pytest

from flink_cdc_log_connectors_spark.sources.jdbc import (
    LogEvent,
    read_snapshot,
    read_snapshot_consistent,
)

URL = "jdbc:derby:memory:cdclive;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
TABLE = "APP.ORDERS"
LOG = "APP.CDC_LOG"


def _conn(spark):
    jvm = spark.sparkContext._jvm
    return jvm.java.sql.DriverManager.getConnection(URL)


def _exec(spark, *stmts: str) -> None:
    conn = _conn(spark)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.executeUpdate(s)
        st.close()
    finally:
        conn.close()


def _query(spark, sql: str) -> list[tuple]:
    conn = _conn(spark)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        n = rs.getMetaData().getColumnCount()
        out = []
        while rs.next():
            out.append(tuple(rs.getObject(i + 1) for i in range(n)))
        rs.close()
        st.close()
        return out
    finally:
        conn.close()


@pytest.fixture()
def live_table(spark):
    """Fresh ORDERS table (ids 1..200) + trigger-log capture, per test."""
    for drop in (
        f"DROP TRIGGER APP.TRG_INS",
        f"DROP TRIGGER APP.TRG_UPD",
        f"DROP TRIGGER APP.TRG_DEL",
        f"DROP TABLE {TABLE}",
        f"DROP TABLE {LOG}",
    ):
        try:
            _exec(spark, drop)
        except Exception:
            pass
    _exec(
        spark,
        f"CREATE TABLE {TABLE} (ID INT PRIMARY KEY, NAME VARCHAR(64))",
        f"""CREATE TABLE {LOG} (
            ID INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
            OP CHAR(1) NOT NULL, K INT NOT NULL, VAL VARCHAR(64))""",
        f"""CREATE TRIGGER APP.TRG_INS AFTER INSERT ON {TABLE}
            REFERENCING NEW AS N FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('c', N.ID, N.NAME)""",
        f"""CREATE TRIGGER APP.TRG_UPD AFTER UPDATE ON {TABLE}
            REFERENCING NEW AS N FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('u', N.ID, N.NAME)""",
        f"""CREATE TRIGGER APP.TRG_DEL AFTER DELETE ON {TABLE}
            REFERENCING OLD AS O FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('d', O.ID, O.NAME)""",
    )
    conn = _conn(spark)
    try:
        ps = conn.prepareStatement(f"INSERT INTO {TABLE} VALUES (?, ?)")
        for i in range(1, 201):
            ps.setInt(1, i)
            ps.setString(2, f"name-{i}")
            ps.addBatch()
        ps.executeBatch()
        ps.close()
    finally:
        conn.close()
    # seed inserts are pre-snapshot history, not backfill: prune them so the
    # log starts at the snapshot boundary (binlog expiry analogue)
    _exec(spark, f"DELETE FROM {LOG}")
    return TABLE


def _log_position(spark) -> int:
    rows = _query(spark, f"SELECT COALESCE(MAX(ID), 0) FROM {LOG}")
    return int(rows[0][0])


def _read_log(spark, low: int, high: int) -> list[LogEvent]:
    rows = _query(
        spark,
        f"SELECT ID, OP, K, VAL FROM {LOG} WHERE ID > {low} AND ID <= {high} ORDER BY ID",
    )
    return [
        LogEvent(offset=int(r[0]), op=str(r[1]).strip(), image={"ID": int(r[2]), "NAME": r[3]})
        for r in rows
    ]


def test_mutate_during_snapshot_exactly_once(spark, live_table):
    """Writes land between each chunk's fetch and its high-watermark capture;
    the merged snapshot must equal the table's final state — no dup, no loss,
    no stale value, deleted key gone."""
    calls = {"n": 0}

    def pos() -> int:
        calls["n"] += 1
        # chunk i brackets with calls (2i+1, 2i+2); mutate just before the
        # HIGH capture of chunks 0 and 2 — the chunk scan has already run,
        # so only the backfill merge can deliver these changes
        if calls["n"] == 2:
            _exec(
                spark,
                f"UPDATE {TABLE} SET NAME='updated-10' WHERE ID=10",
                f"DELETE FROM {TABLE} WHERE ID=20",
            )
        if calls["n"] == 6:
            _exec(
                spark,
                f"UPDATE {TABLE} SET NAME='updated-150' WHERE ID=150",
                f"INSERT INTO {TABLE} VALUES (135, 'late-insert')",
            )
        return _log_position(spark)

    # id 135 must not pre-exist for the late insert
    _exec(spark, f"DELETE FROM {TABLE} WHERE ID=135", f"DELETE FROM {LOG}")

    result = read_snapshot_consistent(
        spark,
        URL,
        TABLE,
        key_col="ID",
        chunk_size=50,
        properties=PROPS,
        log_position_fn=pos,
        read_log_fn=lambda lo, hi: _read_log(spark, lo, hi),
    )
    assert len(result.watermarks) >= 4  # ids 1..200, chunk 50
    got = {r["ID"]: r["NAME"] for r in result.df.collect()}
    final = dict(_query(spark, f"SELECT ID, NAME FROM {TABLE}"))
    assert len(got) == result.df.count()  # no duplicate keys
    assert got == {int(k): v for k, v in final.items()}
    assert got[10] == "updated-10"
    assert 20 not in got
    assert got[135] == "late-insert"
    assert got[150] == "updated-150"
    # per-chunk watermarks are monotone and genuinely bracket the writes
    for w in result.watermarks:
        assert w.low <= w.high
    assert result.max_high == _log_position(spark)


def test_eager_fetch_not_lazy(spark, live_table):
    """A write AFTER chunk 0's high capture, into chunk 0's key range, must
    NOT appear in the snapshot (chunk 0 is consistent at its own high) —
    this is exactly what the lazy single-bracket ``read_snapshot`` gets
    wrong.  The missed event sits at offset > chunk-0-high, i.e. it is the
    log phase's to emit (L2 shouldEmit) — asserted via max_high."""
    calls = {"n": 0}

    def pos() -> int:
        calls["n"] += 1
        if calls["n"] == 3:  # low capture of chunk 1: chunk 0 already sealed
            _exec(spark, f"UPDATE {TABLE} SET NAME='post-seal-11' WHERE ID=11")
        return _log_position(spark)

    result = read_snapshot_consistent(
        spark,
        URL,
        TABLE,
        key_col="ID",
        chunk_size=50,
        properties=PROPS,
        log_position_fn=pos,
        read_log_fn=lambda lo, hi: _read_log(spark, lo, hi),
    )
    got = {r["ID"]: r["NAME"] for r in result.df.collect()}
    assert got[11] == "name-11"  # pre-write value: chunk 0 sealed at its high
    w0 = result.watermarks[0]
    ev = _read_log(spark, w0.high, _log_position(spark))
    assert any(e.image["ID"] == 11 and e.op == "u" for e in ev)
    # snapshot ∪ log-events-past-chunk-highs == final state (exactly-once)
    state = dict(got)
    for e in sorted(ev, key=lambda e: e.offset):
        if e.op == "d":
            state.pop(e.image["ID"], None)
        else:
            state[e.image["ID"]] = e.image["NAME"]
    final = {int(k): v for k, v in dict(_query(spark, f"SELECT ID, NAME FROM {TABLE}")).items()}
    assert state == final


def test_parallel_staging_path(spark, live_table, tmp_path):
    """parallelism>1 + parquet staging: per-chunk brackets still hold and
    the union still reads everything exactly once (the 100 TB shape: no
    executor cache pressure, columnar staging)."""
    result = read_snapshot_consistent(
        spark,
        URL,
        TABLE,
        key_col="ID",
        chunk_size=50,
        properties=PROPS,
        log_position_fn=lambda: _log_position(spark),
        read_log_fn=lambda lo, hi: _read_log(spark, lo, hi),
        staging_dir=str(tmp_path / "stage"),
        parallelism=4,
    )
    rows = result.df.select("ID").collect()
    assert len(rows) == 200
    assert len({r["ID"] for r in rows}) == 200
    assert len(result.watermarks) >= 4
    assert all(w.low <= w.high for w in result.watermarks)


def test_lazy_read_snapshot_documents_the_gap(spark, live_table):
    """Regression guard for WHY read_snapshot_consistent exists: the lazy
    path materializes rows after HIGH was captured, so a write in between
    leaks into the 'snapshot at HIGH'."""
    calls = {"n": 0}

    def pos() -> int:
        calls["n"] += 1
        return _log_position(spark)

    res = read_snapshot(
        spark,
        URL,
        TABLE,
        key_col="ID",
        chunk_size=50,
        properties=PROPS,
        log_position_fn=pos,
    )
    # both watermarks captured; now mutate; THEN run the action
    _exec(spark, f"UPDATE {TABLE} SET NAME='leaked' WHERE ID=10")
    got = {r["ID"]: r["NAME"] for r in res.df.collect()}
    assert got[10] == "leaked"  # the documented inconsistency
