"""Per-DB extended type converters (D2) — the engine's analogue of the
reference's DeserializationRuntimeConverterFactory layer, tested over a
column matrix mirroring ``column_type_test.sql``: ENUM, SET, JSON,
GEOMETRY/POINT → GeoJSON, YEAR, BIT(1), BIT(n), DATE, TIME(µs),
TIMESTAMP(µs), zoned timestamp, and precision-overflow decimals."""

from __future__ import annotations

import base64
import datetime
import json
import struct

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.converters import (
    MYSQL_EXTENDED,
    parse_debezium_typed,
    wkb_to_geojson,
)


def _wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(pts):
    buf = struct.pack("<BII", 1, 2, len(pts))
    for x, y in pts:
        buf += struct.pack("<dd", x, y)
    return buf


def _wkb_polygon(rings):
    buf = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        buf += struct.pack("<I", len(ring))
        for x, y in ring:
            buf += struct.pack("<dd", x, y)
    return buf


def test_wkb_to_geojson_shapes():
    p = json.loads(wkb_to_geojson(_wkb_point(1.0, 2.0), 4326))
    assert p == {"type": "Point", "coordinates": [1.0, 2.0], "srid": 4326}
    ls = json.loads(wkb_to_geojson(_wkb_linestring([(0, 0), (1, 1)]), None))
    assert ls["type"] == "LineString" and ls["srid"] == 0
    assert ls["coordinates"] == [[0.0, 0.0], [1.0, 1.0]]
    pg = json.loads(
        wkb_to_geojson(_wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 0)]]), 0)
    )
    assert pg["type"] == "Polygon" and len(pg["coordinates"][0]) == 4


PHYS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("color", T.StringType(), True),          # enum
        T.StructField("tags", T.ArrayType(T.StringType()), True),  # set
        T.StructField("doc", T.StringType(), True),            # json
        T.StructField("geom", T.StringType(), True),           # geometry
        T.StructField("pt", T.StringType(), True),             # point
        T.StructField("yr", T.IntegerType(), True),            # year
        T.StructField("flag", T.BooleanType(), True),          # bit1
        T.StructField("mask", T.BinaryType(), True),           # bits
        T.StructField("d", T.DateType(), True),                # date_days
        T.StructField("t_ms", T.IntegerType(), True),          # micro_time
        T.StructField("ts6", T.TimestampNTZType(), True),      # micro_timestamp
        T.StructField("tsz", T.TimestampType(), True),         # zoned_timestamp
        T.StructField("big", T.StringType(), True),            # decimal_string
    ]
)

SEMANTICS = dict(
    MYSQL_EXTENDED,
    **{
        "color": "enum",
        "tags": "set",
        "doc": "json",
        "geom": "geometry",
        "pt": "point",
        "yr": "year",
        "flag": "bit1",
        "mask": "bits",
        "d": "date_days",
        "t_ms": "micro_time",
        "ts6": "micro_timestamp",
        "tsz": "zoned_timestamp",
        "big": "decimal_string",
    },
)


def _env(after):
    return json.dumps(
        {
            "before": None,
            "after": after,
            "op": "c",
            "ts_ms": 1,
            "source": {"db": "m", "table": "t", "ts_ms": 1, "file": "b", "pos": 0},
        }
    )


def test_mysql_extended_type_matrix(spark):
    wkb_g = base64.b64encode(_wkb_linestring([(0, 0), (2, 3)])).decode()
    wkb_p = base64.b64encode(_wkb_point(5.0, 6.0)).decode()
    after = {
        "id": 1,
        "color": "red",                    # ENUM label string
        "tags": "a,b,c",                   # SET comma-joined
        "doc": '{"k": 1}',                 # JSON normalized string
        "geom": {"wkb": wkb_g, "srid": 4326},
        "pt": {"wkb": wkb_p, "srid": 0, "x": 5.0, "y": 6.0},
        "yr": 2024,                        # YEAR int
        "flag": True,                      # BIT(1) bool
        "mask": base64.b64encode(b"\x05\x01").decode(),  # BIT(n) base64
        "d": 19723,                        # days since epoch = 2024-01-01
        "t_ms": 45_296_789_000,            # micros-of-day 12:34:56.789
        "ts6": 1_700_000_000_123_456,      # micros since epoch
        "tsz": "2023-11-14T22:13:20Z",     # ISO-8601
        "big": "123456789012345678901234567890.12345",  # precision > 38
    }
    out = parse_debezium_typed(
        spark.createDataFrame([(_env(after),)], "value string"),
        PHYS,
        SEMANTICS,
    ).collect()[0]

    assert out["color"] == "red"
    assert out["tags"] == ["a", "b", "c"]
    assert json.loads(out["doc"]) == {"k": 1}
    g = json.loads(out["geom"])
    assert g == {
        "type": "LineString",
        "coordinates": [[0.0, 0.0], [2.0, 3.0]],
        "srid": 4326,
    }
    p = json.loads(out["pt"])
    assert p["type"] == "Point" and p["coordinates"] == [5.0, 6.0]
    assert out["yr"] == 2024
    assert out["flag"] is True
    assert bytes(out["mask"]) == b"\x05\x01"
    assert out["d"] == datetime.date(2024, 1, 1)
    assert out["t_ms"] == 45_296_789          # millis-of-day (§1.2)
    assert out["ts6"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert out["tsz"] is not None             # LTZ instant preserved
    assert out["big"] == "123456789012345678901234567890.12345"
    assert out["op"] == "c"


def test_set_null_and_empty(spark):
    phys = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
        ]
    )
    rows = [
        (_env({"id": 1, "tags": "x"}),),
        (_env({"id": 2, "tags": ""}),),
        (_env({"id": 3, "tags": None}),),
    ]
    out = {
        r["id"]: r["tags"]
        for r in parse_debezium_typed(
            spark.createDataFrame(rows, "value string"), phys, {"tags": "set"}
        ).collect()
    }
    assert out == {1: ["x"], 2: [], 3: None}


def test_unknown_semantic_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown semantic"):
        parse_debezium_typed(
            spark.createDataFrame([("{}",)], "value string"),
            T.StructType([T.StructField("id", T.IntegerType(), True)]),
            {"id": "uuid_v9"},
        )


def test_oracle_interval_semantics(spark):
    """Oracle INTERVAL DAY TO SECOND (µs) and YEAR TO MONTH (months) wire
    forms land as Spark interval types with µs precision preserved."""
    phys = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField(
                "dur",
                T.DayTimeIntervalType(
                    T.DayTimeIntervalType.DAY, T.DayTimeIntervalType.SECOND
                ),
                True,
            ),
            T.StructField(
                "age",
                T.YearMonthIntervalType(
                    T.YearMonthIntervalType.YEAR, T.YearMonthIntervalType.MONTH
                ),
                True,
            ),
        ]
    )
    after = {
        "id": 1,
        "dur": 93_784_500_000,  # 1d 2h 3m 4.5s in micros
        "age": 26,              # 2 years 2 months
    }
    from pyspark.sql import functions as F

    df = parse_debezium_typed(
        spark.createDataFrame([(_env(after),)], "value string"),
        phys,
        {"dur": "interval_micros", "age": "interval_months"},
    )
    assert dict(df.dtypes)["dur"] == "interval day to second"
    assert dict(df.dtypes)["age"] == "interval year to month"
    # YM intervals can't round-trip to Python objects — assert via string
    out = df.select(
        F.col("dur").cast("string").alias("dur"),
        F.col("age").cast("string").alias("age"),
    ).collect()[0]
    assert out["dur"] == "INTERVAL '1 02:03:04.5' DAY TO SECOND"
    assert out["age"] == "INTERVAL '2-2' YEAR TO MONTH"
