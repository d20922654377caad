"""C5 schema-history persistence, L7 newly-added-table flow, and L5
heartbeats — the round-2 closures of the reference's remaining
source-lifecycle surface."""

from __future__ import annotations

import json
import sqlite3

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.history import SchemaHistory

PHYS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


# ---------------------------------------------------------------------------
# C5 — schema history persistence
# ---------------------------------------------------------------------------


def test_schema_history_roundtrip_and_crash_tolerance(tmp_path):
    h = SchemaHistory(str(tmp_path / "hist"))
    v1 = T.StructType([T.StructField("id", T.IntegerType(), True)])
    v2 = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )
    assert h.record("t1", v1, ddl="CREATE TABLE t1(id int)",
                    offset={"file": "log-0", "pos": 3}) == 0
    assert h.record("t1", v2, ddl="ALTER TABLE t1 ADD name",
                    offset={"file": "log-1", "pos": 7}) == 1
    assert h.record("t2", v1) == 2

    # a fresh instance (≈ restart) restores the LATEST schema per table
    h2 = SchemaHistory(str(tmp_path / "hist"))
    restored = h2.restore_schemas()
    assert restored["t1"] == v2 and restored["t2"] == v1
    assert h2.restore_offsets()["t1"] == {"file": "log-1", "pos": 7}

    # torn tail from a crash mid-append is ignored, and appends continue
    with open(h2.file, "a") as fh:
        fh.write('{"seq": 3, "table": "t1", "schema": "{"trunc')
    h3 = SchemaHistory(str(tmp_path / "hist"))
    assert h3.restore_schemas()["t1"] == v2
    assert h3.record("t2", v2) >= 3
    assert SchemaHistory(str(tmp_path / "hist")).restore_schemas()["t2"] == v2


def test_schema_history_feeds_evolution_policy(tmp_path):
    """Restart flow: restored schema + post-DDL target → widen decision."""
    from flink_cdc_log_connectors_spark.sources.debezium import (
        plan_schema_evolution,
    )

    h = SchemaHistory(str(tmp_path / "hist"))
    v1 = T.StructType([T.StructField("id", T.IntegerType(), True)])
    h.record("t1", v1)
    target = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("extra", T.StringType(), True),
        ]
    )
    plan = plan_schema_evolution(
        SchemaHistory(str(tmp_path / "hist")).restore_schemas()["t1"], target
    )
    assert plan["action"] == "restart_widened"
    assert plan["schema"] == target


# ---------------------------------------------------------------------------
# L7 — newly-added-table flow
# ---------------------------------------------------------------------------


def _env(table, op, after, before, pos, fname):
    ts = 1_700_000_000_000 + pos
    return json.dumps(
        {
            "before": before,
            "after": after,
            "op": op,
            "ts_ms": ts,
            "source": {"db": "inv", "table": table, "ts_ms": ts,
                       "file": fname, "pos": pos},
        }
    )


def test_add_tables_backfill_no_dup_no_loss(spark, tmp_path):
    from flink_cdc_log_connectors_spark.sources.debezium import (
        CHANGELOG_ORDER_BY,
        offset_sort_columns,
    )
    from flink_cdc_log_connectors_spark.streaming.pipeline import (
        add_tables_backfill,
        fanout_by_table,
        read_cdc_stream,
    )
    from flink_cdc_log_connectors_spark.streaming.statetable import read_state

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    f0 = "log-000000.jsonl"
    (log_dir / f0).write_text(
        "\n".join(
            [
                _env("products", "c", {"id": 1, "name": "p1", "weight": 1.0}, None, 0, f0),
                _env("orders_t", "c", {"id": 1, "name": "o1", "weight": 5.0}, None, 1, f0),
                _env("orders_t", "u", {"id": 1, "name": "o1b", "weight": 5.0},
                     {"id": 1, "name": "o1", "weight": 5.0}, 2, f0),
                _env("products", "u", {"id": 1, "name": "p1b", "weight": 2.0},
                     {"id": 1, "name": "p1", "weight": 1.0}, 3, f0),
            ]
        )
        + "\n"
    )

    stream = read_cdc_stream(spark, str(tmp_path), PHYS, starting_offsets="earliest")
    out_base = str(tmp_path / "state")

    def run(tables):
        q = (
            fanout_by_table(
                offset_sort_columns(stream),
                output_base=out_base,
                checkpoint_path=str(tmp_path / "ckpt"),
                keys=["id"],
                order_by=CHANGELOG_ORDER_BY,
                tables=tables,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # phase 1: capture products only — orders history flows by, unmaterialized
    run(["products"])
    assert {r["name"] for r in read_state(spark, f"{out_base}/products", ["id"]).collect()} == {"p1b"}
    assert read_state(spark, f"{out_base}/orders_t", ["id"]) is None

    # phase 2: add orders_t — bounded backfill at the committed offset
    merged = add_tables_backfill(
        spark, str(tmp_path), PHYS, ["orders_t"], out_base, ["id"],
        upto_file=f0, upto_pos=3,
    )
    assert merged["orders_t"] == 3  # c + u's two images
    assert {r["name"] for r in read_state(spark, f"{out_base}/orders_t", ["id"]).collect()} == {"o1b"}

    # phase 3: stream continues from the SAME checkpoint with the widened
    # table list — only post-boundary events apply (no dup, no loss)
    f1 = "log-000001.jsonl"
    (log_dir / f1).write_text(
        "\n".join(
            [
                _env("orders_t", "u", {"id": 1, "name": "o1c", "weight": 6.0},
                     {"id": 1, "name": "o1b", "weight": 5.0}, 0, f1),
                _env("products", "c", {"id": 2, "name": "p2", "weight": 3.0}, None, 1, f1),
            ]
        )
        + "\n"
    )
    run(["products", "orders_t"])
    orders = {r["id"]: r["name"] for r in read_state(spark, f"{out_base}/orders_t", ["id"]).collect()}
    products = {r["id"]: r["name"] for r in read_state(spark, f"{out_base}/products", ["id"]).collect()}
    assert orders == {1: "o1c"}
    assert products == {1: "p1b", 2: "p2"}


# ---------------------------------------------------------------------------
# L5 — heartbeats on the live dialect
# ---------------------------------------------------------------------------


def test_heartbeats_advance_offsets_on_foreign_traffic(spark, tmp_path):
    from flink_cdc_log_connectors_spark.sources.debezium import (
        drop_heartbeats,
        parse_debezium,
    )
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        SqliteCdcStreamReader,
        install_cdc,
    )

    db = str(tmp_path / "live.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE quiet (id INTEGER PRIMARY KEY, name TEXT)")
    conn.execute("CREATE TABLE busy (id INTEGER PRIMARY KEY, name TEXT)")
    conn.commit()
    conn.close()
    install_cdc(db, "quiet")
    install_cdc(db, "busy")

    reader = SqliteCdcStreamReader(
        {
            "path": db,
            "table": "quiet",
            "startingoffsets": "latest",
            "heartbeatinterval": "2",
        }
    )
    start = reader.initialOffset()

    conn = sqlite3.connect(db)
    for i in range(5):
        conn.execute("INSERT INTO busy VALUES (?, ?)", (i, f"b{i}"))
    conn.commit()
    conn.close()

    rows, nxt = reader.read(start)
    rows = list(rows)
    # 5 foreign entries, interval 2 → exactly 2 deterministic heartbeats
    assert len(rows) == 2
    envs = [json.loads(r[0]) for r in rows]
    assert {e["op"] for e in envs} == {"h"}
    # the offset still reaches the end of the foreign traffic
    assert int(nxt["log_id"]) == 5

    # replay of the committed range reproduces the SAME heartbeats
    replay = [json.loads(r[0]) for r in reader.readBetweenOffsets(start, nxt)]
    assert [e["source"]["pos"] for e in replay] == [
        e["source"]["pos"] for e in envs
    ]

    # parse → op='h' rows with null images; drop_heartbeats removes them
    phys = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )
    df = parse_debezium(
        spark.createDataFrame([(r[0],) for r in rows], "value string"), phys
    )
    got = df.collect()
    assert all(r["op"] == "h" and r["id"] is None for r in got)
    assert drop_heartbeats(df).count() == 0
