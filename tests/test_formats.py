"""Canal-JSON / Maxwell-JSON / OGG-JSON format parsers
(sources/formats.py): op mapping, partial-old before-image
reconstruction, metadata struct, timestamp normalization, and
format-agnostic downstream composition (apply_changelog)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.formats import (
    parse_canal_json,
    parse_maxwell_json,
)

PHYS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.LongType()),
    ]
)


def _df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_canal_insert_update_delete(spark):
    lines = [
        json.dumps({
            "data": [{"id": 1, "name": "a", "qty": 5},
                     {"id": 2, "name": "b", "qty": 7}],
            "old": None, "type": "INSERT",
            "database": "shop", "table": "items",
            "es": 1000, "ts": 1001, "pkNames": ["id"],
        }),
        # update: old carries ONLY the changed field (qty)
        json.dumps({
            "data": [{"id": 1, "name": "a", "qty": 9}],
            "old": [{"qty": 5}], "type": "UPDATE",
            "database": "shop", "table": "items",
            "es": 2000, "ts": 2001, "pkNames": ["id"],
        }),
        json.dumps({
            "data": [{"id": 2, "name": "b", "qty": 7}],
            "old": None, "type": "DELETE",
            "database": "shop", "table": "items",
            "es": 3000, "ts": 3001, "pkNames": ["id"],
        }),
    ]
    out = parse_canal_json(_df(spark, lines), PHYS).collect()
    rows = [(r["id"], r["name"], r["qty"], r["op"]) for r in out]
    # insert fans out the data array; update emits before THEN after;
    # delete emits the before image with op 'd'
    assert (1, "a", 5, "c") in rows and (2, "b", 7, "c") in rows
    assert (1, "a", 5, "u") in rows      # before: data overlaid with old.qty
    assert (1, "a", 9, "u") in rows      # after
    assert (2, "b", 7, "d") in rows
    assert len(rows) == 5
    upd = [r for r in out if r["op"] == "u"]
    by_seq = {r["_src"]["img_seq"]: r for r in upd}
    assert by_seq[0]["qty"] == 5 and by_seq[1]["qty"] == 9
    assert all(r["_src"]["database_name"] == "shop" for r in out)
    assert all(r["_src"]["table_name"] == "items" for r in out)
    # canal 'es' (source event time, ms) is the op timestamp
    assert {r["_src"]["op_ts_ms"] for r in out} == {1000, 2000, 3000}


def test_canal_multi_row_update_aligns_old_by_index(spark):
    line = json.dumps({
        "data": [{"id": 1, "name": "a", "qty": 10},
                 {"id": 2, "name": "b", "qty": 20}],
        "old": [{"qty": 1}, {"qty": 2}], "type": "UPDATE",
        "database": "d", "table": "t", "es": 1, "ts": 2, "pkNames": ["id"],
    })
    out = parse_canal_json(_df(spark, [line]), PHYS).collect()
    befores = {(r["id"], r["qty"]) for r in out if r["_src"]["img_seq"] == 0}
    afters = {(r["id"], r["qty"]) for r in out if r["_src"]["img_seq"] == 1}
    assert befores == {(1, 1), (2, 2)}
    assert afters == {(1, 10), (2, 20)}


def test_maxwell_insert_update_delete(spark):
    lines = [
        json.dumps({"database": "shop", "table": "items", "type": "insert",
                    "ts": 10, "xid": 100, "position": "binlog.1:4",
                    "data": {"id": 1, "name": "a", "qty": 5}, "old": None}),
        json.dumps({"database": "shop", "table": "items", "type": "update",
                    "ts": 20, "xid": 101, "position": "binlog.1:9",
                    "data": {"id": 1, "name": "a2", "qty": 5},
                    "old": {"name": "a"}}),
        json.dumps({"database": "shop", "table": "items", "type": "delete",
                    "ts": 30, "xid": 102, "position": "binlog.1:14",
                    "data": {"id": 1, "name": "a2", "qty": 5}, "old": None}),
    ]
    out = parse_maxwell_json(_df(spark, lines), PHYS).collect()
    rows = [(r["id"], r["name"], r["qty"], r["op"]) for r in out]
    assert (1, "a", 5, "c") in rows
    assert (1, "a", 5, "u") in rows and (1, "a2", 5, "u") in rows
    assert (1, "a2", 5, "d") in rows
    assert len(rows) == 4
    # maxwell ts is SECONDS; _src normalizes to ms
    assert {r["_src"]["op_ts_ms"] for r in out} == {10000, 20000, 30000}
    assert out[0]["_src"]["file"].startswith("binlog.1")


def test_formats_compose_with_apply_changelog(spark):
    """Format-agnostic downstream: canal rows materialize to the latest
    state exactly like debezium rows (P7 upsert normalization)."""
    from flink_cdc_log_connectors_spark.operators.changelog import (
        apply_changelog,
    )

    lines = [
        json.dumps({"data": [{"id": 1, "name": "x", "qty": 1}], "old": None,
                    "type": "INSERT", "database": "d", "table": "t",
                    "es": 1, "ts": 1, "pkNames": ["id"]}),
        json.dumps({"data": [{"id": 1, "name": "x", "qty": 2}],
                    "old": [{"qty": 1}],
                    "type": "UPDATE", "database": "d", "table": "t",
                    "es": 2, "ts": 2, "pkNames": ["id"]}),
        json.dumps({"data": [{"id": 2, "name": "y", "qty": 9}], "old": None,
                    "type": "INSERT", "database": "d", "table": "t",
                    "es": 3, "ts": 3, "pkNames": ["id"]}),
        json.dumps({"data": [{"id": 2, "name": "y", "qty": 9}], "old": None,
                    "type": "DELETE", "database": "d", "table": "t",
                    "es": 4, "ts": 4, "pkNames": ["id"]}),
    ]
    parsed = parse_canal_json(_df(spark, lines), PHYS)
    latest = apply_changelog(
        parsed, keys=["id"],
        order_by=["_src.op_ts_ms", "_src.img_seq"],
    )
    rows = {(r["id"], r["qty"]) for r in latest.collect()}
    assert rows == {(1, 2)}  # id 2 deleted; id 1 at its after-image


def test_ogg_insert_update_delete(spark):
    from flink_cdc_log_connectors_spark.sources.formats import parse_ogg_json

    lines = [
        json.dumps({"table": "SHOP.ITEMS", "op_type": "I",
                    "op_ts": "2020-05-13 15:40:06.000000",
                    "current_ts": "2020-05-13 15:40:07.000000",
                    "pos": "00000000000000000001",
                    "primary_keys": ["id"],
                    "before": None,
                    "after": {"id": 1, "name": "a", "qty": 5}}),
        json.dumps({"table": "SHOP.ITEMS", "op_type": "U",
                    "op_ts": "2020-05-13 15:41:06.000000",
                    "current_ts": "2020-05-13 15:41:07.000000",
                    "pos": "00000000000000000002",
                    "primary_keys": ["id"],
                    "before": {"id": 1, "name": "a", "qty": 5},
                    "after": {"id": 1, "name": "a", "qty": 8}}),
        json.dumps({"table": "SHOP.ITEMS", "op_type": "D",
                    "op_ts": "2020-05-13 15:42:06.000000",
                    "current_ts": "2020-05-13 15:42:07.000000",
                    "pos": "00000000000000000003",
                    "primary_keys": ["id"],
                    "before": {"id": 1, "name": "a", "qty": 8},
                    "after": None}),
    ]
    out = parse_ogg_json(_df(spark, lines), PHYS).collect()
    rows = [(r["id"], r["qty"], r["op"]) for r in out]
    assert (1, 5, "c") in rows
    assert (1, 5, "u") in rows and (1, 8, "u") in rows
    assert (1, 8, "d") in rows
    assert len(rows) == 4
    # "DB.TABLE" splits into the metadata slots
    assert all(r["_src"]["database_name"] == "SHOP" for r in out)
    assert all(r["_src"]["table_name"] == "ITEMS" for r in out)
    # wall-clock trail timestamps parse as NTZ epoch ms (no session zone)
    ins = [r for r in out if r["op"] == "c"][0]
    assert ins["_src"]["op_ts_ms"] == 1589384406000
    assert ins["_src"]["emit_ts_ms"] == 1589384407000


def test_ogg_timestamps_session_zone_independent(spark):
    """The op_ts parse must not route through the session timezone —
    a trail replayed under a non-UTC driver must produce the same ms."""
    from flink_cdc_log_connectors_spark.sources.formats import parse_ogg_json

    line = json.dumps({"table": "D.T", "op_type": "I",
                       "op_ts": "2020-01-01 00:00:00.000000",
                       "current_ts": "2020-01-01 00:00:00.000000",
                       "pos": "p", "primary_keys": ["id"],
                       "before": None,
                       "after": {"id": 1, "name": "x", "qty": 1}})
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        out = parse_ogg_json(_df(spark, [line]), PHYS).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert out[0]["_src"]["op_ts_ms"] == 1577836800000


# --------------------------------------------------------------------------
# Property: any valid change sequence encoded as canal / maxwell / ogg
# must materialize (parse ∘ apply_changelog) to the dict-replay state.
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_OPS = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(1, 4),
        st.integers(0, 99),
    ),
    min_size=1,
    max_size=16,
)


def _normalize(raw):
    """Turn an arbitrary op list into a VALID history (u/d need an
    existing row) plus the expected final state."""
    state, hist = {}, []
    for op, key, qty in raw:
        if op == "u" and key not in state:
            op = "c"
        if op == "c" and key in state:
            op = "u"
        if op == "d" and key not in state:
            continue
        before = state.get(key)
        if op == "d":
            del state[key]
            hist.append(("d", key, before, None))
        else:
            state[key] = qty
            hist.append((op, key, before, qty))
    return hist, state


def _row(key, qty):
    return {"id": key, "name": f"n{key}", "qty": qty}


@given(raw=_OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_formats_agree_with_dict_replay(spark, raw):
    from flink_cdc_log_connectors_spark.operators.changelog import (
        apply_changelog,
    )
    from flink_cdc_log_connectors_spark.sources.formats import (
        parse_canal_json,
        parse_maxwell_json,
        parse_ogg_json,
    )

    hist, state = _normalize(raw)
    if not hist:
        return
    canal, maxwell, ogg = [], [], []
    for i, (op, key, before, after) in enumerate(hist):
        if op == "c":
            canal.append({"data": [_row(key, after)], "old": None,
                          "type": "INSERT", "database": "d", "table": "t",
                          "es": i, "ts": i, "pkNames": ["id"]})
            maxwell.append({"database": "d", "table": "t", "type": "insert",
                            "data": _row(key, after), "old": None, "ts": i,
                            "xid": i, "position": str(i)})
            ogg.append({"table": "D.T", "op_type": "I",
                        "op_ts": "2020-01-01 00:00:00.000000",
                        "current_ts": "2020-01-01 00:00:00.000000",
                        "pos": f"{i:020d}", "primary_keys": ["id"],
                        "before": None, "after": _row(key, after)})
        elif op == "u":
            canal.append({"data": [_row(key, after)],
                          "old": [{"qty": before}],
                          "type": "UPDATE", "database": "d", "table": "t",
                          "es": i, "ts": i, "pkNames": ["id"]})
            maxwell.append({"database": "d", "table": "t", "type": "update",
                            "data": _row(key, after), "old": {"qty": before},
                            "ts": i, "xid": i, "position": str(i)})
            ogg.append({"table": "D.T", "op_type": "U",
                        "op_ts": "2020-01-01 00:00:00.000000",
                        "current_ts": "2020-01-01 00:00:00.000000",
                        "pos": f"{i:020d}", "primary_keys": ["id"],
                        "before": _row(key, before),
                        "after": _row(key, after)})
        else:
            canal.append({"data": [_row(key, before)], "old": None,
                          "type": "DELETE", "database": "d", "table": "t",
                          "es": i, "ts": i, "pkNames": ["id"]})
            maxwell.append({"database": "d", "table": "t", "type": "delete",
                            "data": _row(key, before), "old": None, "ts": i,
                            "xid": i, "position": str(i)})
            ogg.append({"table": "D.T", "op_type": "D",
                        "op_ts": "2020-01-01 00:00:00.000000",
                        "current_ts": "2020-01-01 00:00:00.000000",
                        "pos": f"{i:020d}", "primary_keys": ["id"],
                        "before": _row(key, before), "after": None})

    expected = {(k, q) for k, q in state.items()}
    parses = [
        (parse_canal_json, canal, ["_src.op_ts_ms", "_src.img_seq"]),
        (parse_maxwell_json, maxwell, ["_src.op_ts_ms", "_src.img_seq"]),
        (parse_ogg_json, ogg, ["_src.file", "_src.img_seq"]),
    ]
    for parse, lines, order in parses:
        parsed = parse(_df(spark, [json.dumps(e) for e in lines]), PHYS)
        latest = apply_changelog(parsed, keys=["id"], order_by=order)
        got = {(r["id"], r["qty"]) for r in latest.collect()}
        assert got == expected, f"{parse.__name__}: {got} != {expected}"


def test_unknown_event_types_keep_raw_op(spark):
    """Maxwell bootstrap/DDL message types must stay VISIBLE (raw type
    string as op, debezium-parser parity), not become NULL-op rows that
    a downstream op != 'd' filter silently drops."""
    from flink_cdc_log_connectors_spark.sources.formats import (
        parse_canal_json,
        parse_maxwell_json,
        parse_ogg_json,
    )

    mx = json.dumps({"database": "d", "table": "t",
                     "type": "bootstrap-insert",
                     "data": {"id": 1, "name": "a", "qty": 2},
                     "old": None, "ts": 5, "xid": 1, "position": "p"})
    out = parse_maxwell_json(_df(spark, [mx]), PHYS).collect()
    assert [(r["id"], r["op"]) for r in out] == [(1, "bootstrap-insert")]

    ca = json.dumps({"data": [{"id": 2, "name": "b", "qty": 3}],
                     "old": None, "type": "CREATE", "database": "d",
                     "table": "t", "es": 5, "ts": 6, "pkNames": ["id"]})
    out = parse_canal_json(_df(spark, [ca]), PHYS).collect()
    assert [(r["id"], r["op"]) for r in out] == [(2, "CREATE")]

    og = json.dumps({"table": "D.T", "op_type": "T",
                     "op_ts": "2020-01-01 00:00:00.000000",
                     "current_ts": "2020-01-01 00:00:00.000000",
                     "pos": "p", "primary_keys": ["id"],
                     "before": None,
                     "after": {"id": 3, "name": "c", "qty": 4}})
    out = parse_ogg_json(_df(spark, [og]), PHYS).collect()
    assert [(r["id"], r["op"]) for r in out] == [(3, "T")]


def test_reader_offsets_flow_into_src(spark):
    """When the cdclog reader's file/pos columns are present, they define
    _src.file/_src.pos — the engine's changelog total order works across
    messages even when the format's own timestamp ties (canal 'es' is
    ms-granular)."""
    from flink_cdc_log_connectors_spark.sources.formats import (
        parse_canal_json,
        parse_maxwell_json,
    )

    def env(qty, es):
        return json.dumps({"data": [{"id": 1, "name": "a", "qty": qty}],
                           "old": None, "type": "INSERT", "database": "d",
                           "table": "t", "es": es, "ts": es,
                           "pkNames": ["id"]})

    # two messages for the same key in the SAME millisecond
    df = spark.createDataFrame(
        [(env(10, 5), "log-1.jsonl", 0), (env(20, 5), "log-1.jsonl", 1)],
        "value string, file string, pos long",
    )
    out = parse_canal_json(df, PHYS).collect()
    by_pos = {r["_src"]["pos"]: (r["_src"]["file"], r["qty"]) for r in out}
    assert by_pos == {0: ("log-1.jsonl", 10), 1: ("log-1.jsonl", 20)}

    mx = json.dumps({"database": "d", "table": "t", "type": "insert",
                     "data": {"id": 1, "name": "a", "qty": 7},
                     "old": None, "ts": 5, "xid": 9, "position": "b.1:9"})
    df = spark.createDataFrame(
        [(mx, "log-2.jsonl", 3)], "value string, file string, pos long"
    )
    r = parse_maxwell_json(df, PHYS).collect()[0]
    assert r["_src"]["file"] == "log-2.jsonl" and r["_src"]["pos"] == 3
    # without reader columns, maxwell's own position string is provenance
    r = parse_maxwell_json(_df(spark, [mx]), PHYS).collect()[0]
    assert r["_src"]["file"] == "b.1:9" and r["_src"]["pos"] == 9
