"""Sharded-table operators — the reference's multi-table/regex capture.

The reference captures several physical tables as one logical stream
(``table-name`` regex; sharded ``customers_N`` fixtures `customer.sql:21-60`,
heterogeneous ``user_1``/``user_2`` shards whose column sets differ —
``MySqlConnectorITCase`` user-table tests).  The Spark equivalents:

- homogeneous shards → ``union_shards`` (plain unionByName; at scale each
  shard is its own chunked snapshot + log filter, unioned lazily — no
  shuffle, partition counts add);
- heterogeneous shards → ``merge_heterogeneous_shards`` (union-by-name with
  NULLs for columns a shard lacks — the reference pads missing DB fields
  with NULL the same way, ``RowDataDebeziumDeserializeSchema.java:610-612``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_shards(shards: Sequence[DataFrame], shard_col: str | None = None) -> DataFrame:
    """Union same-schema shards; optionally tag each row with its shard
    index (the reference exposes ``table_name`` metadata for the same
    purpose)."""
    if not shards:
        raise ValueError("union_shards requires at least one shard")
    tagged = (
        [df.withColumn(shard_col, F.lit(i)) for i, df in enumerate(shards)]
        if shard_col
        else list(shards)
    )
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out


def merge_heterogeneous_shards(shards: Sequence[DataFrame]) -> DataFrame:
    """Union shards whose column sets differ: the result schema is the
    union of all columns; shards missing a column contribute NULLs."""
    if not shards:
        raise ValueError("merge_heterogeneous_shards requires at least one shard")
    out = shards[0]
    for df in shards[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
