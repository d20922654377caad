"""Sharded-table merging — FIXTURES A5 (homogeneous customers_N) and A7
(heterogeneous user_1/user_2 with differing column sets)."""

from __future__ import annotations

import pytest

from flink_cdc_log_connectors_spark.operators.relational import q4, q4b
from flink_cdc_log_connectors_spark.operators.shards import (
    merge_heterogeneous_shards,
    union_shards,
)


def test_union_shards_homogeneous(spark):
    s1 = spark.createDataFrame([(101, "a"), (102, "b")], "id int, name string")
    s2 = spark.createDataFrame([(201, "c")], "id int, name string")
    out = union_shards([s1, s2], shard_col="shard")
    rows = {(r["id"], r["shard"]) for r in out.collect()}
    assert rows == {(101, 0), (102, 0), (201, 1)}


def test_merge_heterogeneous_shards(spark):
    # user_table_1_1 has email; user_table_1_2 does not (FIXTURES A7)
    u1 = spark.createDataFrame(
        [(111, "u1", "addr1", "p1", "e1@x.com")],
        "id int, name string, address string, phone_number string, email string",
    )
    u2 = spark.createDataFrame(
        [(121, "u2", "addr2", "p2")],
        "id int, name string, address string, phone_number string",
    )
    out = merge_heterogeneous_shards([u1, u2])
    assert set(out.columns) == {"id", "name", "address", "phone_number", "email"}
    by_id = {r["id"]: r for r in out.collect()}
    assert by_id[111]["email"] == "e1@x.com"
    assert by_id[121]["email"] is None  # missing column → NULL padding


def test_empty_shard_list_raises(spark):
    with pytest.raises(ValueError):
        union_shards([])


def test_approx_distinct_error_bound(spark, sf_dir):
    exact = q4(spark, sf_dir).collect()[0]["suppliers"]
    approx = q4b(spark, sf_dir).collect()[0]["suppliers_approx"]
    assert abs(approx - exact) <= max(0.1 * exact, 2)
