"""Debezium envelope parsing — the reference's D1/D2/D5 semantics
(RowDataDebeziumDeserializeSchema.deserialize:117-146)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.debezium import parse_debezium

PHYSICAL = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def _env(before=None, after=None, op="c", ts=1000, file="b.1", pos=1):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "op": op,
            "ts_ms": ts,
            "source": {"db": "inventory", "table": "products", "ts_ms": ts, "file": file, "pos": pos},
        }
    )


def _parse(spark, lines):
    df = spark.createDataFrame([(v,) for v in lines], "value string")
    return parse_debezium(df, PHYSICAL)


def test_create_and_read_take_after_image(spark):
    out = _parse(
        spark,
        [
            _env(after={"id": 1, "name": "scooter", "weight": 3.14}, op="c"),
            _env(after={"id": 2, "name": "car", "weight": 8.1}, op="r"),
        ],
    ).collect()
    assert {(r["id"], r["op"]) for r in out} == {(1, "c"), (2, "r")}


def test_delete_rewritten_as_before_image_insert(spark):
    out = _parse(
        spark, [_env(before={"id": 7, "name": "gone", "weight": 1.0}, op="d")]
    ).collect()
    assert len(out) == 1
    assert (out[0]["id"], out[0]["name"], out[0]["op"]) == (7, "gone", "d")


def test_update_emits_two_rows(spark):
    out = _parse(
        spark,
        [
            _env(
                before={"id": 3, "name": "old", "weight": 1.0},
                after={"id": 3, "name": "new", "weight": 2.0},
                op="u",
            )
        ],
    ).collect()
    assert sorted((r["name"], r["op"]) for r in out) == [("new", "u"), ("old", "u")]


def test_missing_fields_become_null(spark):
    # reference :610-612 — DB fields absent from the envelope → NULL
    out = _parse(spark, [_env(after={"id": 9}, op="c")]).collect()
    assert out[0]["name"] is None and out[0]["weight"] is None


def test_op_is_last_physical_column(spark):
    df = _parse(spark, [_env(after={"id": 1}, op="c")])
    phys_and_op = [c for c in df.columns if c != "_src"]
    assert phys_and_op[-1] == "op"


def test_metadata_columns(spark):
    out = _parse(
        spark,
        [
            _env(after={"id": 1}, op="c", ts=5555),
            _env(after={"id": 2}, op="r", ts=7777),
        ],
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["_src"]["database_name"] == "inventory"
    assert by_id[1]["_src"]["table_name"] == "products"
    assert by_id[1]["_src"]["op_ts_ms"] == 5555
    # snapshot rows get op_ts forced to epoch 0 (RecordUtils.java:197-207)
    assert by_id[2]["_src"]["op_ts_ms"] == 0


def test_malformed_json_yields_null_row(spark):
    out = _parse(spark, ["{not json"]).collect()
    # from_json → null envelope → one all-null row with null op
    assert len(out) == 1 and out[0]["op"] is None
