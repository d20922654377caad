"""Skew mitigation + co-located storage — the 100 TB shuffle toolbox.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) handles most runtime skew; these operators
cover the cases AQE cannot re-plan:

- ``salted_agg`` — two-phase aggregation for hot GROUP BY keys: stage 1
  aggregates on (key, salt) spreading a hot key over N reducers, stage 2
  combines the N partials.  Works for any algebraic aggregate list.
- ``salted_join`` — replicate the small side N ways, salt the big side:
  a hot join key's rows land on N reducers instead of one.
- ``write_bucketed`` / ``read_bucketed`` — persist a table hash-bucketed
  by its join/merge keys so repeated joins and ``apply_changelog`` runs
  need no exchange at all (the storage-level answer to the reference's
  per-chunk parallelism).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output name → (input column, fn) with fn ∈ {sum, count, min,
    max} (algebraic — partials combine exactly).
    """
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Use when the small side is too large to broadcast but the big side has
    hot keys AQE cannot split (e.g. after a non-shuffle stage).
    """
    big_s = big.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    small_r = small.select("*", salts)
    joined = big_s.join(small_r, [on, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (and optionally sorted) by the merge/join keys:
    later equi-joins and apply_changelog windows over ``keys`` read
    co-located, pre-sorted buckets — no exchange, no sort."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_cols: Sequence[str] | None = None,
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Time-partitioned, time-sorted layout for event/changelog tables.

    - directory partition on the truncated timestamp → Catalyst partition
      PRUNING: a time-range query lists only matching directories (at
      100 TB of history, a one-day query touches 1/365th of the files
      before any IO happens);
    - ``sortWithinPartitions`` on (ts, *sort_cols) → parquet row-group
      min/max zone maps are tight, so pushed-down range predicates skip
      row groups inside each file too.

    One ``repartition`` by the partition value keeps one writer task per
    partition directory (no small-file explosion — the classic failure of
    naive partitioned writes).
    """
    unit = {"day": "dd", "hour": "hh", "month": "mm"}[granularity]
    part = F.date_trunc(
        {"dd": "day", "hh": "hour", "mm": "month"}[unit], F.col(ts_col)
    ).cast("date" if granularity != "hour" else "timestamp")
    out = df.withColumn("__part", part)
    sort_by = [ts_col, *(sort_cols or [])]
    (
        out.repartition(F.col("__part"))
        .sortWithinPartitions("__part", *sort_by)
        .write.mode(mode)
        .partitionBy("__part")
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession,
    path: str,
    ts_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Range read over a ``write_time_partitioned`` layout: the partition
    filter prunes directories, the ts predicate prunes row groups."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("__part") >= F.lit(start).cast(df.schema["__part"].dataType))
        & (F.col(ts_col) >= F.to_timestamp(F.lit(start)))
        & (F.col(ts_col) < F.to_timestamp(F.lit(end)))
    ).drop("__part")


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key of two non-negative integer columns: bit i of
    each input lands at output bits 2i / 2i+1.  Sorting or range-
    partitioning a table by this key co-locates rows that are close in
    BOTH dimensions, so parquet row-group min/max zone maps prune
    two-dimensional range predicates — the standard lakehouse layout
    trick for (key, time) or (tenant, key) access patterns.  Pure
    codegen'd integer arithmetic (2·bits shift-mask-or terms), identical
    in any engine."""
    out = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(one)
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(one)
        out = out.bitwiseOR(
            F.shiftleft(b1, 2 * i)
        ).bitwiseOR(F.shiftleft(b2, 2 * i + 1))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist sorted by the Morton key of (c1, c2): range predicates on
    EITHER dimension (or both) skip row groups via zone maps, where a
    single-column sort only serves its own column."""
    (
        df.withColumn("__z", zorder_key(F.col(c1), F.col(c2), bits))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (l_partkey, l_suppkey) with the per-key range
    a Z-ordered file would advertise: the layout computation itself,
    oracle-checked bit for bit."""
    from ..io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key(
        F.pmod(F.col("l_partkey"), F.lit(1 << 16)),
        F.pmod(F.col("l_suppkey"), F.lit(1 << 16)),
    )
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            z.alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(2000)
    )


def _zorder_sql() -> str:
    terms = " | ".join(
        f"(((p >> {i}) & 1) << {2 * i}) | (((s >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return f"""
WITH b AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         ((l_partkey % 65536) + 65536) % 65536 AS p,
         ((l_suppkey % 65536) + 65536) % 65536 AS s
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({terms} AS BIGINT) AS zkey
FROM b ORDER BY zkey, l_orderkey, l_linenumber LIMIT 2000
"""


def changelog_skew_hotkey_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog materialization under a hot-key distribution — the
    reference's huge-split / hot-row regime (its
    ``testBigTableWithHugeSplits`` class of cases) exercised through the
    AGGREGATION materialization path.

    The events table is rebadged as a change log in which ONE key
    (``k = -1``) receives every 10th event — 10% of the whole log — while
    the rest spread over ~|users| keys; ``error`` events are deletes.
    ``apply_changelog_agg`` (max_by) materializes latest state: partial
    aggregation collapses the hot key to ONE candidate row per input
    partition BEFORE the shuffle, so the exchange carries ~|keys| rows
    and no reducer sees the 10% fan-in — the skew-safe twin of the
    row_number window in ``apply_changelog`` (which would sort the whole
    hot partition on one task).  Scale: measured in
    ``scripts/scale_smoke.py``; SCALING.md has the 10× ratio."""
    from ..io import load_table
    from .changelog import apply_changelog_agg

    events = load_table(spark, sf_dir, "events")
    log = events.select(
        F.when(F.col("event_id") % 10 == 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
    )
    latest = apply_changelog_agg(log, keys=["k"], order_by=["event_id"])
    return latest.select(
        "k",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    ).orderBy("k")


CHANGELOG_SKEW_SQL = """
WITH log AS (
  SELECT CASE WHEN event_id % 10 = 0 THEN -1 ELSE user_id END AS k,
         event_id, value,
         CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
  FROM events
),
latest AS (
  SELECT k,
         MAX(event_id) AS last_event_id,
         ARG_MAX(value, event_id) AS last_value,
         ARG_MAX(op, event_id) AS last_op
  FROM log GROUP BY k
)
SELECT k, last_event_id, last_value
FROM latest WHERE last_op <> 'd' ORDER BY k
"""


SKEW_QUERIES = {
    "layout_zorder_key": (zorder_query, _zorder_sql()),
    "changelog_skew_hotkey": (changelog_skew_hotkey_query, CHANGELOG_SKEW_SQL),
}


def salted_agg_hotkey_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation, driver-checked on a HOT key
    distribution (one key takes half the events): stage 1 aggregates on
    (key, salt) — the hot key spreads over 16 reducers — stage 2
    combines the exact algebraic partials.  Equal to the naive GROUP BY
    (the oracle's form) because every partial is exact: counts are
    integers and sums run on DECIMAL(18,2), so no float-summation-order
    term can differ between the salted and flat groupings."""
    from ..io import load_table

    events = load_table(spark, sf_dir, "events")
    df = events.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.col("value").cast("decimal(18,2)").alias("vdec"),
    )
    out = salted_agg(
        df,
        ["k"],
        {
            "n_events": ("vdec", "count"),
            "sum_value": ("vdec", "sum"),
            "max_value": ("vdec", "max"),
        },
    )
    return out.select(
        "k",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("k")


SALTED_AGG_SQL = """
SELECT CASE WHEN event_id % 2 = 0 THEN -1 ELSE user_id END AS k,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1 ORDER BY k
"""


SKEW_QUERIES["agg_salted_hotkey"] = (
    salted_agg_hotkey_query,
    SALTED_AGG_SQL,
)
