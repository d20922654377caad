"""L3 table filtering, L6 schema-change side channel, D6 validation."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.sources.debezium import (
    filter_tables,
    parse_debezium,
    schema_change_events,
    validate_before_images,
)

PHYS = T.StructType([T.StructField("id", T.IntegerType(), True)])


def _env(op, table, id_=1, before=None):
    return json.dumps(
        {
            "before": before,
            "after": {"id": id_} if op != "d" else None,
            "op": op,
            "ts_ms": 1,
            "source": {"db": "inv", "table": table, "ts_ms": 1, "file": "f", "pos": 0},
        }
    )


def test_filter_tables(spark):
    lines = [
        _env("c", "products"),
        _env("c", "products_on_hand"),
        _env("c", "orders"),
    ]
    df = parse_debezium(
        spark.createDataFrame([(v,) for v in lines], "value string"), PHYS
    )
    got = filter_tables(df, database="inv", table_regex="^products.*")
    tables = sorted(r["_src"]["table_name"] for r in got.collect())
    assert tables == ["products", "products_on_hand"]
    assert filter_tables(df, database="other").count() == 0


def test_schema_change_side_channel(spark):
    lines = [
        _env("c", "products"),
        json.dumps(
            {
                "source": {"db": "inv", "table": "products", "ts_ms": 9},
                "ts_ms": 9,
                "databaseName": "inv",
                "ddl": "ALTER TABLE products ADD COLUMN color VARCHAR(32)",
            }
        ),
    ]
    raw = spark.createDataFrame([(v,) for v in lines], "value string")
    ddl = schema_change_events(raw).collect()
    assert len(ddl) == 1
    assert ddl[0]["ddl"].startswith("ALTER TABLE products")
    assert ddl[0]["database_name"] == "inv"
    # data rows keep flowing through the main parse unaffected
    assert parse_debezium(raw, PHYS).filter("op = 'c'").count() == 1


def test_validate_before_images(spark):
    lines = [
        _env("u", "products", before={"id": 1}),   # valid update
        _env("d", "products", before=None),         # broken delete (no before)
        _env("c", "products"),                      # creates need no before
    ]
    df = parse_debezium(
        spark.createDataFrame([(v,) for v in lines], "value string"), PHYS
    )
    checked = validate_before_images(df, probe_col="id")
    by_op = {(r["op"], r["_valid"]) for r in checked.collect()}
    assert ("u", True) in by_op
    assert ("d", False) in by_op
    assert ("c", True) in by_op


def test_plan_schema_evolution():
    from pyspark.sql import types as T

    from flink_cdc_log_connectors_spark.sources.debezium import (
        plan_schema_evolution,
    )

    cur = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.FloatType()),
        ]
    )
    # identical → none
    assert plan_schema_evolution(cur, cur)["action"] == "none"
    # add column + widen int->long, float->double → restart with new schema
    widened = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    plan = plan_schema_evolution(cur, widened)
    assert plan["action"] == "restart_widened"
    assert plan["schema"] == widened
    assert sorted(plan["changes"]) == [
        "add:note:string", "widen:id:int->bigint", "widen:price:float->double",
    ]
    # dropped column → resnapshot
    dropped = T.StructType([T.StructField("id", T.IntegerType())])
    assert plan_schema_evolution(cur, dropped)["action"] == "resnapshot"
    # narrowing → resnapshot
    narrowed = T.StructType(
        [
            T.StructField("id", T.ShortType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.FloatType()),
        ]
    )
    assert plan_schema_evolution(cur, narrowed)["action"] == "resnapshot"
