"""Python UDTF registration and SQL usage."""

from __future__ import annotations

from flink_cdc_log_connectors_spark.functions.udtf import register_udtfs


def test_tokenize_udtf(spark):
    register_udtfs(spark)
    rows = spark.sql("SELECT * FROM tokenize('Hello, World! 42')").collect()
    assert [(r["pos"], r["token"]) for r in rows] == [
        (0, "hello"),
        (1, "world"),
        (2, "42"),
    ]


def test_tokenize_udtf_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b"), (2, "c")], "id int, txt string"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT id, t.token FROM docs_udtf, LATERAL tokenize(txt) t ORDER BY id, t.pos"
    ).collect()
    assert [(r["id"], r["token"]) for r in rows] == [(1, "a"), (1, "b"), (2, "c")]


def test_explode_changelog_ops(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM explode_changelog_ops('c,u,d,r,x')"
    ).collect()
    assert [r["label"] for r in rows] == [
        "create",
        "update",
        "delete",
        "snapshot-read",
        "unknown",
    ]
