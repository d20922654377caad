"""Type-matrix test — SURVEY §1.2 mapping exercised through the Debezium
parse path (mirror of MySqlConnectorITCase.testAllDataTypes /
``column_type_test.sql``'s full_types table)."""

from __future__ import annotations

import json
from decimal import Decimal

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.debezium import parse_debezium

FULL_TYPES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("tiny_c", T.ByteType(), True),
        T.StructField("small_c", T.ShortType(), True),
        T.StructField("int_c", T.IntegerType(), True),
        T.StructField("big_c", T.LongType(), True),
        # BIGINT UNSIGNED widens to DECIMAL(20,0) (MySqlTypeUtils.java:84-133)
        T.StructField("big_un_c", T.DecimalType(20, 0), True),
        T.StructField("varchar_c", T.StringType(), True),
        T.StructField("bool_c", T.BooleanType(), True),
        T.StructField("float_c", T.FloatType(), True),
        T.StructField("double_c", T.DoubleType(), True),
        T.StructField("decimal_c", T.DecimalType(8, 4), True),
        T.StructField("date_c", T.DateType(), True),
        # TIME → INT millis-of-day (Spark has no TimeType; documented §1.2)
        T.StructField("time_c", T.IntegerType(), True),
        T.StructField("ts_c", T.TimestampNTZType(), True),
        T.StructField("ts_ltz_c", T.TimestampType(), True),
        T.StructField("bin_c", T.BinaryType(), True),
        # MySQL SET → ARRAY<STRING> (MySqlDeserializationConverterFactory:122-143)
        T.StructField("set_c", T.ArrayType(T.StringType()), True),
        T.StructField("json_c", T.StringType(), True),
        T.StructField("nested", T.StructType([T.StructField("a", T.IntegerType())]), True),
    ]
)

ROW = {
    "id": 1,
    "tiny_c": 127,
    "small_c": 32767,
    "int_c": 2147483647,
    "big_c": 9223372036854775807,
    "big_un_c": 18446744073709551615,
    "varchar_c": "Hello World",
    "bool_c": True,
    "float_c": 123.102,
    "double_c": 404.4443,
    "decimal_c": 123.4567,
    "date_c": "2020-07-17",
    "time_c": 64822000,
    "ts_c": "2020-07-17T18:00:22.123",
    "ts_ltz_c": "2020-07-17T18:00:22Z",
    "bin_c": "YWJj",
    "set_c": ["a", "b"],
    "json_c": "{\"key1\":\"value1\"}",
    "nested": {"a": 7},
}


def test_full_type_matrix_roundtrip(spark):
    env = json.dumps({"after": ROW, "op": "r", "source": {"db": "d", "table": "t"}})
    df = spark.createDataFrame([(env,)], "value string")
    out = parse_debezium(df, FULL_TYPES)
    # declared schema drives the produced row type (reference :582-623)
    assert [f.name for f in out.schema.fields[:-2]] == [f.name for f in FULL_TYPES.fields]
    r = out.collect()[0]
    assert r["tiny_c"] == 127 and r["small_c"] == 32767
    assert r["big_un_c"] == Decimal("18446744073709551615")
    assert r["decimal_c"] == Decimal("123.4567")
    assert str(r["date_c"]) == "2020-07-17"
    assert r["time_c"] == 64822000
    assert r["ts_c"].isoformat().startswith("2020-07-17T18:00:22.123")
    assert r["bin_c"] is not None
    assert r["set_c"] == ["a", "b"]
    assert json.loads(r["json_c"])["key1"] == "value1"
    assert r["nested"]["a"] == 7
    assert r["op"] == "r"
