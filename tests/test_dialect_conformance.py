"""Dialect-conformance suite (S3): the snapshot→log protocol assertions —
exactly-once under interleaved writes, restart-resume, deterministic
replay, startup modes, watermark monotonicity, heartbeats — parameterized
over the dialect SPI so ANY dialect drops into a ready harness.

Runs against both shipped dialects (``cdclog`` file, ``cdcsqlite`` live
trigger-log).  A future MySQL/Postgres dialect only needs a ``Harness``
subclass (~40 lines): create a table, apply ops, report state, build a
stream reader.  This is the portable twin of the reference's shared
connector IT-case base (``MySqlConnectorITCase`` et al. share the same
assertion script across databases).
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest
from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.datasource import (
    CdcLogStreamReader,
    RAW_SCHEMA,
)
from flink_cdc_log_connectors_spark.sources.debezium import (
    CHANGELOG_ORDER_BY,
    offset_sort_columns,
    parse_debezium,
)
from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
    SqliteCdcStreamReader,
    install_cdc,
)

PHYSICAL = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.DoubleType()),
    ]
)

#: ops vocabulary shared by all harnesses: ("c"|"u", id, name, qty) | ("d", id)
Op = tuple


class Harness:
    """Everything the conformance script needs from one dialect."""

    name: str
    supports_heartbeats = False
    supports_chunk_watermarks = False

    def setup(self, tmp_path, n: int) -> None:
        """Create the backing store seeded with rows id=1..n."""
        raise NotImplementedError

    def reader(self, budget: int, **opts):
        """A fresh SimpleDataSourceStreamReader over the store."""
        raise NotImplementedError

    def apply(self, ops: list[Op]) -> None:
        """Commit mutations to the live store / append them to the log."""
        raise NotImplementedError

    def state(self) -> dict[int, tuple[str, float]]:
        """Current table state (the exactly-once ground truth)."""
        raise NotImplementedError


class SqliteHarness(Harness):
    name = "sqlite"
    supports_heartbeats = True
    supports_chunk_watermarks = True

    def setup(self, tmp_path, n: int) -> None:
        self.db = str(tmp_path / "conf.db")
        conn = sqlite3.connect(self.db)
        conn.execute(
            "CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, qty REAL)"
        )
        conn.executemany(
            "INSERT INTO items VALUES (?, ?, ?)",
            [(i, f"item-{i}", float(i % 7)) for i in range(1, n + 1)],
        )
        conn.commit()
        conn.close()
        install_cdc(self.db, "items")

    def reader(self, budget: int, **opts):
        o = {
            "path": self.db,
            "table": "items",
            "chunksize": str(budget),
            "maxeventsperbatch": str(budget),
        }
        o.update({k.lower(): str(v) for k, v in opts.items()})
        return SqliteCdcStreamReader(o)

    def apply(self, ops: list[Op]) -> None:
        conn = sqlite3.connect(self.db)
        for op in ops:
            if op[0] == "d":
                conn.execute("DELETE FROM items WHERE id = ?", (op[1],))
            elif op[0] == "c":
                conn.execute("INSERT INTO items VALUES (?, ?, ?)", op[1:])
            else:
                conn.execute(
                    "UPDATE items SET name = ?, qty = ? WHERE id = ?",
                    (op[2], op[3], op[1]),
                )
        conn.commit()
        conn.close()

    def state(self) -> dict[int, tuple[str, float]]:
        conn = sqlite3.connect(self.db)
        try:
            return {
                r[0]: (r[1], r[2])
                for r in conn.execute("SELECT id, name, qty FROM items")
            }
        finally:
            conn.close()


class FileHarness(Harness):
    name = "file"

    def setup(self, tmp_path, n: int) -> None:
        self.snap_dir = str(tmp_path / "snapshot")
        self.log_dir = str(tmp_path / "log")
        os.makedirs(self.snap_dir)
        os.makedirs(self.log_dir)
        self._state = {i: (f"item-{i}", float(i % 7)) for i in range(1, n + 1)}
        with open(os.path.join(self.snap_dir, "state-000.jsonl"), "w") as fh:
            for i, (name, qty) in sorted(self._state.items()):
                fh.write(json.dumps({"id": i, "name": name, "qty": qty}) + "\n")
        self._log_seq = 0
        self._ts = 1_700_000_000_000

    def reader(self, budget: int, **opts):
        o = {
            "path": self.log_dir,
            "snapshotpath": self.snap_dir,
            "maxlinesperbatch": str(budget),
        }
        o.update({k.lower(): str(v) for k, v in opts.items()})
        return CdcLogStreamReader(o)

    def apply(self, ops: list[Op]) -> None:
        lines = []
        for op in ops:
            self._ts += 1000
            if op[0] == "d":
                before = {"id": op[1], **dict(zip(("name", "qty"), self._state[op[1]]))}
                after = None
                self._state.pop(op[1])
            else:
                before = (
                    {"id": op[1], **dict(zip(("name", "qty"), self._state[op[1]]))}
                    if op[1] in self._state
                    else None
                )
                after = {"id": op[1], "name": op[2], "qty": op[3]}
                self._state[op[1]] = (op[2], op[3])
            lines.append(
                json.dumps(
                    {
                        "before": before,
                        "after": after,
                        "op": op[0],
                        "ts_ms": self._ts,
                        "source": {
                            "db": "main",
                            "table": "items",
                            "ts_ms": self._ts,
                            "file": f"log-{self._log_seq:06d}.jsonl",
                            "pos": len(lines),
                        },
                    }
                )
            )
        with open(
            os.path.join(self.log_dir, f"log-{self._log_seq:06d}.jsonl"), "w"
        ) as fh:
            fh.write("\n".join(lines) + "\n")
        self._log_seq += 1

    def state(self) -> dict[int, tuple[str, float]]:
        return dict(self._state)


class DerbyTriggerHarness(Harness):
    """Third dialect: the generic JDBC trigger-log reader over embedded
    Derby — every engine access is a real java.sql query through the
    Spark JVM (`sources/jdbc_trigger_dialect.py`)."""

    name = "derby"
    supports_chunk_watermarks = True

    TABLE = "APP.ITEMS"
    LOG = "APP.CDC_LOG"

    def setup(self, tmp_path, n: int) -> None:
        from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
            execute_sql,
            install_capture,
        )

        self.url = (
            f"jdbc:derby:memory:conf{abs(hash(str(tmp_path))) % 10**9}"
            ";create=true"
        )
        execute_sql(
            self.url,
            f"CREATE TABLE {self.TABLE} "
            "(ID INT PRIMARY KEY, NAME VARCHAR(64), QTY DOUBLE)",
        )
        seed = ", ".join(
            f"({i}, 'item-{i}', {float(i % 7)})" for i in range(1, n + 1)
        )
        execute_sql(self.url, f"INSERT INTO {self.TABLE} VALUES {seed}")
        install_capture(
            self.url,
            self.TABLE,
            self.LOG,
            [("ID", "INT"), ("NAME", "VARCHAR(64)"), ("QTY", "DOUBLE")],
        )

    def reader(self, budget: int, **opts):
        from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
            JdbcTriggerLogStreamReader,
        )

        o = {
            "url": self.url,
            "table": self.TABLE,
            "logtable": self.LOG,
            "columns": "id,name,qty",
            "chunksize": str(budget),
            "maxeventsperbatch": str(budget),
        }
        o.update({k.lower(): str(v) for k, v in opts.items()})
        return JdbcTriggerLogStreamReader(o)

    def apply(self, ops: list[Op]) -> None:
        from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
            execute_sql,
        )

        stmts = []
        for op in ops:
            if op[0] == "d":
                stmts.append(f"DELETE FROM {self.TABLE} WHERE ID = {op[1]}")
            elif op[0] == "c":
                stmts.append(
                    f"INSERT INTO {self.TABLE} VALUES "
                    f"({op[1]}, '{op[2]}', {op[3]})"
                )
            else:
                stmts.append(
                    f"UPDATE {self.TABLE} SET NAME = '{op[2]}', "
                    f"QTY = {op[3]} WHERE ID = {op[1]}"
                )
        execute_sql(self.url, *stmts)

    def state(self) -> dict[int, tuple[str, float]]:
        from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
            query_sql,
        )

        return {
            int(r[0]): (r[1], float(r[2]))
            for r in query_sql(
                self.url, f"SELECT ID, NAME, QTY FROM {self.TABLE}"
            )
        }


@pytest.fixture(params=["sqlite", "file", "derby"])
def harness(request, tmp_path):
    h = {
        "sqlite": SqliteHarness,
        "file": FileHarness,
        "derby": DerbyTriggerHarness,
    }[request.param]()
    h.setup(tmp_path, n=120)
    return h


# ---------------------------------------------------------------------------
# shared drivers
# ---------------------------------------------------------------------------


def drain(reader, cur=None, max_batches: int = 400):
    """Drive a SimpleDataSourceStreamReader to quiescence."""
    rows, offsets = [], []
    cur = reader.initialOffset() if cur is None else cur
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
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    parsed = offset_sort_columns(parse_debezium(df, PHYSICAL))
    final = apply_changelog(parsed, keys=["id"], order_by=CHANGELOG_ORDER_BY)
    return {r["id"]: (r["name"], r["qty"]) for r in final.collect()}


def assert_no_duplicate_offsets(rows) -> None:
    offs = [
        (r[1], r[2]) for r in rows if json.loads(r[0])["op"] not in ("r", "h")
    ]
    assert len(offs) == len(set(offs)), "a log event was delivered twice"


MUTATION_SCRIPT = [
    [("u", 5, "item-5", 999.0), ("d", 50), ("c", 500, "late", 1.0)],
    [("u", 100, "item-100", 888.0), ("u", 60, "renamed", 6.0)],
    [("d", 5), ("c", 50, "reborn", 2.0)],
]


# ---------------------------------------------------------------------------
# the conformance script itself — identical for every dialect
# ---------------------------------------------------------------------------


def test_exactly_once_with_interleaved_writes(spark, harness):
    """Writes land between read() calls (some during the snapshot phase,
    some in the log phase); the materialized result must equal the store's
    final state with no event delivered twice."""
    reader = harness.reader(budget=40)
    rows = []
    cur = reader.initialOffset()
    script = iter(MUTATION_SCRIPT)
    for _ in range(200):
        batch, cur = reader.read(cur)
        batch = list(batch)
        rows.extend(batch)
        nxt = next(script, None)
        if nxt is not None:
            harness.apply(nxt)
        elif not batch and cur.get("phase") == "log":
            break
    assert_no_duplicate_offsets(rows)
    assert materialize(spark, rows) == harness.state()


def test_restart_resume_from_committed_offset(spark, harness):
    """Crash after the first batch; writes land while down; a NEW reader
    resumes from the committed offset with no loss and no duplicates."""
    r1 = harness.reader(budget=40)
    rows = []
    cur = r1.initialOffset()
    batch, committed = r1.read(cur)
    rows.extend(batch)

    harness.apply([("u", 10, "while-down", -1.0), ("d", 20)])

    r2 = harness.reader(budget=40)
    more, _ = drain(r2, cur=committed)
    rows.extend(more)
    assert_no_duplicate_offsets(rows)
    assert materialize(spark, rows) == harness.state()


def test_replay_committed_range_deterministic(spark, harness):
    """C3/C4: readBetweenOffsets over a committed log range returns the
    exact same rows on every call (recovery replay contract)."""
    harness.apply([("u", 3, "x", 1.0), ("u", 4, "y", 2.0), ("d", 6)])
    reader = harness.reader(budget=1000)
    _, offsets = drain(reader)
    log_offs = [o for o in offsets if o.get("phase") == "log"]
    assert len(log_offs) >= 2
    start, end = log_offs[0], log_offs[-1]
    a = list(harness.reader(budget=1000).readBetweenOffsets(start, end))
    b = list(harness.reader(budget=1000).readBetweenOffsets(start, end))
    assert a == b
    assert len(a) >= 0  # bounded, no exception — content equality is the gate


def test_startup_latest_sees_only_new_events(spark, harness):
    """§2.6 latest: skip snapshot AND history; only post-start commits."""
    harness.apply([("u", 1, "pre", 0.0)])
    reader = harness.reader(budget=1000, startingoffsets="latest")
    cur = reader.initialOffset()
    assert cur.get("phase") == "log"
    harness.apply([("u", 2, "post", 5.0), ("c", 777, "new", 7.0)])
    rows, _ = drain(reader, cur=cur)
    ids = [
        (json.loads(r[0])["after"] or {}).get("id")
        for r in rows
        if json.loads(r[0])["op"] not in ("r", "h")
    ]
    assert 777 in ids and 2 in ids
    assert 1 not in ids  # pre-start history skipped
    assert not any(json.loads(r[0])["op"] == "r" for r in rows)  # no snapshot


def test_snapshot_watermarks_monotone(harness):
    """P5: per-chunk high watermarks are monotone non-decreasing and move
    when commits land during the snapshot (live dialects only)."""
    if not harness.supports_chunk_watermarks:
        pytest.skip(f"{harness.name}: no live chunk watermarks by design")
    reader = harness.reader(budget=40)
    cur = reader.initialOffset()
    offsets = [cur]
    while cur.get("phase") == "snapshot":
        _, cur = reader.read(cur)
        offsets.append(cur)
        harness.apply([("u", 1, "tick", float(len(offsets)))])
    highs = next(o for o in offsets if o.get("phase") == "log")["chunk_highs"]
    assert highs == sorted(highs)
    assert highs[-1] > highs[0]  # commits during the snapshot moved the mark


def test_heartbeats_on_idle_table(harness):
    """L5: traffic on OTHER tables advances the log; ours is idle — the
    dialect must emit synthetic op='h' rows so event-time keeps moving."""
    if not harness.supports_heartbeats:
        pytest.skip(f"{harness.name}: heartbeats not supported by design")
    conn = sqlite3.connect(harness.db)
    conn.execute("CREATE TABLE other (id INTEGER PRIMARY KEY, v TEXT)")
    conn.commit()
    conn.close()
    install_cdc(harness.db, "other")
    reader = harness.reader(budget=1000, heartbeatinterval="5")
    _, offsets = drain(reader)  # snapshot of items; cursor now at log end
    cur = offsets[-1]
    conn = sqlite3.connect(harness.db)
    for i in range(25):
        conn.execute("INSERT INTO other VALUES (?, 'x')", (i,))
    conn.commit()
    conn.close()
    more, _ = drain(reader, cur=cur)
    hb = [r for r in more if json.loads(r[0])["op"] == "h"]
    assert len(hb) >= 4  # 25 foreign entries / every-5 → ≥4 heartbeats


def test_jdbc_query_value_conversion(spark):
    """query_sql converts JDBC object types explicitly (BigDecimal,
    temporal classes) and raises loudly on unknown classes instead of
    guessing."""
    from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
        query_sql,
    )

    url = "jdbc:derby:memory:convtest;create=true"
    rows = query_sql(
        url,
        "VALUES (CAST(1.50 AS DECIMAL(5,2)), CAST(7 AS BIGINT), "
        "CAST('x' AS VARCHAR(4)), CURRENT_TIMESTAMP)",
    )
    dec, big, s, ts = rows[0]
    assert dec == 1.5 and isinstance(dec, float)
    assert big == 7
    assert s == "x"
    assert isinstance(ts, int) and ts > 1_500_000_000_000  # epoch millis


def test_jdbc_prune_log_retention(spark, tmp_path):
    """Acknowledged audit rows can be dropped; the reader keeps working
    from the committed offset (binlog-expiry analogue, sqlite parity)."""
    from flink_cdc_log_connectors_spark.sources.jdbc_trigger_dialect import (
        prune_log,
        query_sql,
    )

    h = DerbyTriggerHarness()
    h.setup(tmp_path, n=30)
    reader = h.reader(budget=1000)
    _, offsets = drain(reader)
    cur = offsets[-1]
    h.apply([("u", 1, "x", 1.0), ("u", 2, "y", 2.0)])
    rows, cur = reader.read(cur)
    assert len(list(rows)) == 2
    prune_log(h.url, h.LOG, int(cur["log_id"]))
    remaining = query_sql(h.url, f"SELECT COUNT(*) FROM {h.LOG}")[0][0]
    assert remaining == 0
    # post-prune commits still flow
    h.apply([("u", 3, "z", 3.0)])
    more, _ = reader.read(cur)
    assert len(list(more)) == 1


def test_startup_specific_offset_resumes_exactly(spark, harness):
    """§2.6 specific-offset: resume the log after an exact committed
    position — only events past it are delivered (live dialects)."""
    if not harness.supports_chunk_watermarks:  # file dialect: offsets are
        pytest.skip(f"{harness.name}: no integer log ids")  # file/pos pairs
    harness.apply([("u", 1, "before", 1.0)])
    # discover the current position via a latest reader
    probe = harness.reader(budget=1000, startingoffsets="latest")
    pos = probe.initialOffset()["log_id"]
    harness.apply([("u", 2, "after", 2.0), ("c", 901, "new", 9.0)])
    reader = harness.reader(
        budget=1000, startingoffsets=f"specific:{pos}"
    )
    cur = reader.initialOffset()
    assert cur == {"phase": "log", "log_id": pos}
    rows, _ = drain(reader, cur=cur)
    ids = [
        (json.loads(r[0])["after"] or {}).get("id")
        for r in rows
        if json.loads(r[0])["op"] not in ("r", "h")
    ]
    assert 2 in ids and 901 in ids and 1 not in ids


def test_startup_timestamp_seeks_first_event_at_or_after(spark, harness):
    """§2.6 timestamp-millis: deliver the first event committed at or
    after T, skipping older history (live dialects)."""
    import time as _time

    if not harness.supports_chunk_watermarks:
        pytest.skip(f"{harness.name}: no live timestamp seek")
    harness.apply([("u", 1, "old", 1.0)])
    _time.sleep(1.1)  # second-granularity clocks must observe a gap
    t_ms = int(_time.time() * 1000) - 500
    harness.apply([("u", 2, "fresh", 2.0)])
    reader = harness.reader(
        budget=1000, startingoffsets=f"timestamp:{t_ms}"
    )
    rows, _ = drain(reader, cur=reader.initialOffset())
    ids = [
        (json.loads(r[0])["after"] or {}).get("id")
        for r in rows
        if json.loads(r[0])["op"] not in ("r", "h")
    ]
    assert 2 in ids and 1 not in ids
