"""Temporal/changelog-time operators: as-of join and SCD2 history.

Spark has no native as-of join (SURVEY §2.7 lists it as a declared-surface
gap).  The scalable formulation used here is the union-and-carry-forward
window: tag both inputs, union them, sort per key by (time, side), and carry
the last right-side payload forward with ``last(..., ignorenulls)``.  One
hash shuffle on the key — same cost envelope as a regular sort-merge join,
no range explosion, no per-group Python (`pd.merge_asof` via applyInPandas
is the fallback only when the key space is so skewed one key exceeds a
partition).

SCD2 (slowly-changing-dimension type 2) materializes a change log into a
versioned history table: one row per (key, version) with
``valid_from``/``valid_to``/``is_current`` — the standard warehouse shape
for CDC-fed dimensions (the reference's users build this in Flink SQL over
the op column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` for the same key (NULLs when none).

    ``tie_break``: extra right-side ordering columns making equal-time
    right rows deterministic (e.g. an event id).
    """
    l_tagged = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}") for c in tie_break],
    )
    r_tagged = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
        *[F.col(c).alias(f"__tb_{c}") for c in tie_break],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal time (side 0 < 1), so an
    # equal-timestamp right row IS visible to the left row; tie_break orders
    # equal-time right rows deterministically
    order = [F.col("__t"), F.col("__side")] + [F.col(f"__tb_{c}") for c in tie_break]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(w).alias(f"__cv_{c}")
            for c in value_cols
        ],
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__cv_{c}").alias(c) for c in value_cols]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Change log → SCD2 history: each change opens a version valid from its
    timestamp until the next change of the same key (NULL = still open).
    Delete events close the current version without opening a new one
    (their row carries ``is_deleted`` = true and a self-closing interval).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull() & (F.col(op_col) != delete_op))
        .withColumn("is_deleted", F.col(op_col) == delete_op)
    )


# --------------------------------------------------------------------------
# registry queries
# --------------------------------------------------------------------------


def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: the customer's latest event value as of the order
    date (changelog point-in-time lookup — Q14's as-of generalization)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    out = asof_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        events.select("user_id", "ts", "event_id", "value"),
        left_on="o_custkey",
        right_on="user_id",
        left_time="o_orderdate",
        right_time="ts",
        value_cols=["value"],
        tie_break=["event_id"],
    )
    return out.select(
        "o_orderkey", F.col("value").alias("asof_value")
    ).orderBy("o_orderkey").limit(500)


ASOF_SQL = """
WITH u AS (
  SELECT o_custkey AS k, o_orderdate AS t, 1 AS side, o_orderkey,
         NULL::DOUBLE AS rv, NULL::BIGINT AS tb
  FROM orders
  UNION ALL
  SELECT user_id, ts, 0, NULL, value, event_id FROM events
),
carried AS (
  SELECT side, o_orderkey,
         LAST_VALUE(rv IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY t, side, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
  FROM u
)
SELECT o_orderkey, asof_value FROM carried WHERE side = 1
ORDER BY o_orderkey LIMIT 500
"""


def scd2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of the events changelog (user_id dimension)."""
    events = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        events,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        ts_col="ts",
        op_col="event_type",
        delete_op="delete",
    )
    return (
        hist.select("user_id", "event_id", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from", "event_id")
        .limit(1000)
    )


SCD2_SQL = """
SELECT user_id, event_id, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        AND event_type <> 'delete') AS is_current
FROM events
ORDER BY user_id, valid_from, event_id LIMIT 1000
"""


def cdc_parse_throughput_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC deserialization throughput probe: wrap the events table as
    Debezium envelope JSON (to_json), then run the engine's full parse
    path (from_json + image explode + op append + metadata) and aggregate —
    the closest analogue of the reference's events/sec deserializer hot
    loop, measured inside the bench."""
    from ..sources.debezium import parse_debezium
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    env = events.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("user_id"), F.col("value"), F.col("event_id")
                ).alias("after"),
                F.when(F.col("event_type") == "error", "d")
                .when(F.col("event_type") == "purchase", "u")
                .otherwise("c")
                .alias("op"),
                F.struct(
                    F.lit("bench").alias("db"),
                    F.lit("events").alias("table"),
                    (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
                    F.lit("f0").alias("file"),
                    F.col("event_id").alias("pos"),
                ).alias("source"),
            )
        ).alias("value")
    )
    # 'u' without before-image: the envelope has only after → before NULL row
    physical = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    parsed = parse_debezium(env, physical)
    return (
        parsed.groupBy("op")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("op")
    )


TEMPORAL_QUERIES = {
    "cdc_asof_join": (asof_query, ASOF_SQL),
    "cdc_scd2_history": (scd2_query, SCD2_SQL),
    # engine-internal envelope round-trip — no ANSI oracle; rows-only
    "cdc_parse_throughput": (cdc_parse_throughput_query, None),
}
