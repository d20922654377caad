"""OceanBase dialect (S8): JDBC snapshot + commit-log tail over the SPI,
driven by a fake logproxy client backed by a LIVE Derby trigger log —
the protocol (per-chunk commit-version watermarks, backfill merge, L2
shouldEmit on the tail) runs for real; only the network client is faked
(reference ``OceanBaseRichSourceFunction.java:157-215, 282-300``)."""

from __future__ import annotations

import json

import pytest

from flink_cdc_log_connectors_spark.sources.oceanbase import (
    LogMessage,
    envelope,
    log_events_from_messages,
    read_snapshot_with_commitlog,
    tail_commitlog,
)

URL = "jdbc:derby:memory:obtest;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
TABLE = "APP.OB_ORDERS"
LOG = "APP.OB_LOG"


def _conn(spark):
    return spark.sparkContext._jvm.java.sql.DriverManager.getConnection(URL)


def _exec(spark, *stmts):
    conn = _conn(spark)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.executeUpdate(s)
        st.close()
    finally:
        conn.close()


def _query(spark, sql):
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


class FakeLogProxyClient:
    """LogProxyClient over the Derby trigger log: commit version = the
    log row's identity (totally ordered by commit, like OceanBase's
    cluster commit timestamp)."""

    def __init__(self, spark):
        self.spark = spark

    def current_commit_version(self) -> int:
        return int(_query(self.spark, f"SELECT COALESCE(MAX(ID),0) FROM {LOG}")[0][0])

    def fetch(self, after_version, upto_version=None):
        q = f"SELECT ID, OP, K, VAL FROM {LOG} WHERE ID > {after_version}"
        if upto_version is not None:
            q += f" AND ID <= {upto_version}"
        q += " ORDER BY ID"
        return [
            LogMessage(
                op=str(r[1]).strip(),
                tenant="sys",
                database="app",
                table=TABLE,
                before={"ID": int(r[2]), "NAME": r[3]} if str(r[1]).strip() == "d" else None,
                after=None if str(r[1]).strip() == "d" else {"ID": int(r[2]), "NAME": r[3]},
                commit_version=int(r[0]),
            )
            for r in _query(self.spark, q)
        ]


@pytest.fixture()
def ob_table(spark):
    for drop in (
        "DROP TRIGGER APP.OB_INS",
        "DROP TRIGGER APP.OB_UPD",
        "DROP TRIGGER APP.OB_DEL",
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
        f"""CREATE TRIGGER APP.OB_INS AFTER INSERT ON {TABLE}
            REFERENCING NEW AS N FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('c', N.ID, N.NAME)""",
        f"""CREATE TRIGGER APP.OB_UPD AFTER UPDATE ON {TABLE}
            REFERENCING NEW AS N FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('u', N.ID, N.NAME)""",
        f"""CREATE TRIGGER APP.OB_DEL AFTER DELETE ON {TABLE}
            REFERENCING OLD AS O FOR EACH ROW
            INSERT INTO {LOG}(OP, K, VAL) VALUES ('d', O.ID, O.NAME)""",
    )
    conn = _conn(spark)
    try:
        ps = conn.prepareStatement(f"INSERT INTO {TABLE} VALUES (?, ?)")
        for i in range(1, 121):
            ps.setInt(1, i)
            ps.setString(2, f"row-{i}")
            ps.addBatch()
        ps.executeBatch()
        ps.close()
    finally:
        conn.close()
    _exec(spark, f"DELETE FROM {LOG}")  # seed history is pre-snapshot
    return TABLE


def test_snapshot_plus_tail_exactly_once(spark, ob_table):
    """Mutations land during the snapshot AND after it; snapshot ∪
    shouldEmit-filtered tail equals the final table state — no loss, no
    double delivery (the OceanBaseConnectorITCase contract)."""
    client = FakeLogProxyClient(spark)
    calls = {"n": 0}
    real = client.current_commit_version

    def probed():
        calls["n"] += 1
        if calls["n"] == 2:  # inside chunk 0's (low, high] window
            _exec(
                spark,
                f"UPDATE {TABLE} SET NAME='mid-10' WHERE ID=10",
                f"DELETE FROM {TABLE} WHERE ID=20",
            )
        return real()

    client.current_commit_version = probed
    result = read_snapshot_with_commitlog(
        spark, URL, TABLE, "ID", client, properties=PROPS, chunk_size=40
    )
    client.current_commit_version = real
    assert len(result.watermarks) >= 3
    snap = {r["ID"]: r["NAME"] for r in result.df.collect()}
    assert snap[10] == "mid-10" and 20 not in snap  # backfill merged

    # post-snapshot traffic → the tail, with shouldEmit vs chunk highs
    _exec(
        spark,
        f"UPDATE {TABLE} SET NAME='tail-50' WHERE ID=50",
        f"INSERT INTO {TABLE} VALUES (500, 'tail-new')",
    )
    wm = [(w.chunk.start, w.chunk.end, w.high) for w in result.watermarks]
    tail = list(
        tail_commitlog(client, TABLE, "ID", min(w.low for w in result.watermarks), wm)
    )
    # replay tail over snapshot
    state = dict(snap)
    for value, _f, _pos in tail:
        env = json.loads(value)
        img = env["after"] or env["before"]
        if env["op"] == "d":
            state.pop(img["ID"], None)
        else:
            state[img["ID"]] = img["NAME"]
    final = {int(k): v for k, v in dict(_query(spark, f"SELECT ID, NAME FROM {TABLE}")).items()}
    assert state == final
    # exactly-once: mid-snapshot events (already merged) were suppressed
    versions = [json.loads(v)["source"]["pos"] for v, _f, _p in tail]
    assert len(versions) == len(set(versions))
    mid_snapshot_ids = {json.loads(v)["after"]["ID"] for v, _f, _p in tail if json.loads(v)["op"] == "u"}
    assert 10 not in mid_snapshot_ids  # merged into its chunk, not re-emitted
    assert 50 in mid_snapshot_ids  # genuinely-post-snapshot update emitted


def test_envelope_metadata_parity(spark):
    """OceanBaseReadableMetadata triplet + op_ts = commit version."""
    m = LogMessage(
        op="u", tenant="sys", database="app", table="t",
        before={"ID": 1, "NAME": "a"}, after={"ID": 1, "NAME": "b"},
        commit_version=42,
    )
    env = json.loads(envelope(m))
    assert env["source"]["tenant"] == "sys"
    assert env["source"]["db"] == "app" and env["source"]["table"] == "t"
    assert env["source"]["pos"] == 42 and env["ts_ms"] == 42000
    evs = log_events_from_messages([m], "t")
    assert evs[0].offset == 42 and evs[0].op == "u" and evs[0].image["NAME"] == "b"
