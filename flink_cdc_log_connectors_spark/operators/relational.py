"""The declared relational query surface (SURVEY.md §2.9, Q1-Q18).

The reference delegates all relational work to Flink SQL (its ITCases run
``SELECT name, SUM(weight) FROM source GROUP BY name`` — reference
``MySqlConnectorITCase.java:186``); here the same surface is expressed with
the Spark DataFrame API and verified against a DuckDB oracle.

Cross-engine determinism discipline:

- Doubles are CAST to DECIMAL(18,2) *before* aggregation (exact decimal
  arithmetic in both engines — the synthetic data is 2-decimal-valued so the
  cast itself is exact), and final aggregate columns are cast to DOUBLE
  (exact decimal → correctly-rounded nearest double in both engines).
- AVG is computed as CAST(SUM(decimal) AS DOUBLE)/COUNT — both engines then
  perform the identical IEEE double division instead of engine-specific
  decimal-average scale rules.
- Every computed column is aliased identically in the DataFrame plan and the
  oracle SQL (the driver sorts columns by name before hashing).
- Every ORDER BY ... LIMIT has a tie-free total order.

Scale notes (100 TB readiness):

- Dimension joins (nation 25 rows, region 5 rows, per-nation aggregates)
  carry explicit ``F.broadcast`` hints — no shuffle of the fact side.
- Aggregations are plain ``groupBy().agg()`` — Catalyst plans
  partial (map-side) + final aggregation, so the shuffle carries one row
  per (partition × group), not per input row.
- Top-k (``ORDER BY ... LIMIT k``) compiles to TakeOrderedAndProject —
  per-partition heaps, no global sort.
- All filters/projections are Catalyst expressions → parquet pushdown and
  column pruning apply (see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

DEC = "decimal(18,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(DEC)


# --------------------------------------------------------------------------
# Q1 projection + scalar functions  (reference README.md:56 pattern)
# --------------------------------------------------------------------------
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.select(
            "c_custkey",
            F.upper("c_name").alias("name_u"),
            F.round(_dec("c_acctbal"), 1).cast("double").alias("bal"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


Q1_SQL = """
SELECT c_custkey, UPPER(c_name) AS name_u,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS bal
FROM customer ORDER BY c_custkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q2 filter + predicates
# --------------------------------------------------------------------------
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
        .select(
            "o_orderkey",
            "o_orderstatus",
            _dec("o_totalprice").cast("double").alias("price"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


Q2_SQL = """
SELECT o_orderkey, o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
ORDER BY o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q3 grouped aggregation  (reference ITCase:186 pattern: SUM ... GROUP BY)
# --------------------------------------------------------------------------
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total"),
        )
        .orderBy("c_mktsegment")
    )


Q3_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Q4 distinct aggregation
# --------------------------------------------------------------------------
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(F.countDistinct("l_suppkey").alias("suppliers"))


Q4_SQL = "SELECT COUNT(DISTINCT l_suppkey) AS suppliers FROM lineitem"


def q4b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog++) — the scale path for Q4.
    Sketch implementations differ per engine, so this is a rows-only check;
    the test suite bounds its error against the exact count."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("suppliers_approx")
    )


# --------------------------------------------------------------------------
# Q5 inner equi join (dimension side broadcast — no fact shuffle)
# --------------------------------------------------------------------------
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("n_name")
    )


Q5_SQL = """
SELECT n_name, COUNT(*) AS cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --------------------------------------------------------------------------
# Q6 multi-way join + broadcast (nation and region are tiny dims)
# --------------------------------------------------------------------------
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy("r_name", "n_name")
    )


Q6_SQL = """
SELECT r_name, n_name, COUNT(*) AS customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# Q7 outer/semi/anti joins
# --------------------------------------------------------------------------
def q7a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no matching customer (left outer + IS NULL ≡ anti join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(100)
    )


Q7A_SQL = """
SELECT o_orderkey FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL ORDER BY o_orderkey LIMIT 100
"""


def q7b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one order (EXISTS ≡ left semi join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


Q7B_SQL = """
SELECT c_custkey FROM customer WHERE EXISTS
  (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey LIMIT 100
"""


def q7c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (NOT EXISTS ≡ left anti join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


Q7C_SQL = """
SELECT c_custkey FROM customer WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q8 TPC-H Q1-style wide aggregate (partial+final agg, exact decimals)
# --------------------------------------------------------------------------
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q8_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q9 rollup / grouping sets
# --------------------------------------------------------------------------
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q9_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q9b(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q9B_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --------------------------------------------------------------------------
# Q10 window functions: ranking + running frame
# --------------------------------------------------------------------------
def q10a(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
        .limit(300)
    )


Q10A_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t WHERE rk <= 3 ORDER BY o_custkey, rk LIMIT 300
"""


def q10b(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


Q10B_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
FROM orders ORDER BY o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q11 sort / limit / top-k  (TakeOrderedAndProject — no global sort)
# --------------------------------------------------------------------------
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
    )


Q11_SQL = """
SELECT p_partkey, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey LIMIT 20
"""


# --------------------------------------------------------------------------
# Q12 set operations
# --------------------------------------------------------------------------
def q12a(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .intersect(supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


Q12A_SQL = """
SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
"""


def q12b(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .subtract(supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


Q12B_SQL = """
SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k
"""


def q12c(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    unioned = customer.select(F.col("c_nationkey").alias("k")).unionAll(
        supplier.select(F.col("s_nationkey").alias("k"))
    )
    return unioned.groupBy("k").agg(F.count(F.lit(1)).alias("n")).orderBy("k")


Q12C_SQL = """
SELECT k, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier) t
GROUP BY k ORDER BY k
"""


# --------------------------------------------------------------------------
# Q13 date/string/math/conditional scalars
# --------------------------------------------------------------------------
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.substring("o_orderpriority", 1, 1).alias("pri"),
            F.length("o_orderstatus").alias("ln"),
            F.when(F.col("o_totalprice") > 5000, "big").otherwise("small").alias("sz"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


Q13_SQL = """
SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
       SUBSTRING(o_orderpriority, 1, 1) AS pri, CAST(LENGTH(o_orderstatus) AS INT) AS ln,
       CASE WHEN o_totalprice > 5000 THEN 'big' ELSE 'small' END AS sz
FROM orders ORDER BY o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q14 changelog materialization — the reference's P7/L2 semantics
# (latest event per key wins, deletes drop the key).  Implemented by the
# engine's apply_changelog operator (operators/changelog.py).
# --------------------------------------------------------------------------
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .changelog import apply_changelog

    events = load_table(spark, sf_dir, "events")
    latest = apply_changelog(
        events,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        op_col="event_type",
        delete_op="delete",
    )
    return latest.select("user_id", "value").orderBy("user_id").limit(200)


Q14_SQL = """
SELECT user_id, value FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND event_type <> 'delete'
ORDER BY user_id LIMIT 200
"""


def q14b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same changelog materialization via the max_by aggregation strategy —
    map-side partial aggregation instead of a window sort (the better plan
    under hot-key fan-in; both are correctness-checked against one oracle).
    """
    from .changelog import apply_changelog_agg

    events = load_table(spark, sf_dir, "events")
    latest = apply_changelog_agg(
        events,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        op_col="event_type",
        delete_op="delete",
    )
    return latest.select("user_id", "value").orderBy("user_id").limit(200)


# --------------------------------------------------------------------------
# Q15 op-code breakdown (the fork's op column — SURVEY §0)
# --------------------------------------------------------------------------
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("op"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("op")
    )


Q15_SQL = """
SELECT event_type AS op, COUNT(*) AS n, MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY event_type ORDER BY op
"""


# --------------------------------------------------------------------------
# Q16 time-window aggregation (tumbling window, batch form)
# --------------------------------------------------------------------------
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.datetime import date_trunc_ntz

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            date_trunc_ntz("hour", "ts").alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("v"),
        )
        .orderBy("h", "event_type")
        .limit(500)
    )


Q16_SQL = """
SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
FROM events GROUP BY DATE_TRUNC('hour', ts), event_type ORDER BY h, event_type LIMIT 500
"""


# --------------------------------------------------------------------------
# Q17 JSON extraction (props is a JSON string; MySQL JSON→STRING mapping,
# reference MySqlDeserializationConverterFactory ENUM/JSON→STRING)
# --------------------------------------------------------------------------
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").isNotNull())
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .orderBy("event_id")
        .limit(100)
    )


Q17_SQL = """
SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
WHERE props IS NOT NULL ORDER BY event_id LIMIT 100
"""


# --------------------------------------------------------------------------
# Q18 correlated scalar subquery (decorrelated to a broadcast join; the
# AVG comparison is done multiplicatively in exact decimals:
# acctbal > SUM/COUNT  ⇔  acctbal*COUNT > SUM  (COUNT > 0)
# --------------------------------------------------------------------------
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    per_nation = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum(_dec("c_acctbal")).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        customer.join(F.broadcast(per_nation), customer.c_nationkey == per_nation.nk)
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("total"))
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey FROM customer c
JOIN (SELECT c_nationkey AS nk,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
             COUNT(*) AS cnt
      FROM customer GROUP BY c_nationkey) a
  ON c.c_nationkey = a.nk
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * a.cnt > a.total
ORDER BY c_custkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q19 pivot (wide conditional aggregation — portable form of PIVOT)
# --------------------------------------------------------------------------
_PIVOT_STATUSES = ["F", "O", "P"]


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [s for s in _PIVOT_STATUSES])
        .select(
            "o_orderpriority",
            *[F.col(s).alias(f"n_{s}") for s in _PIVOT_STATUSES],
        )
        .orderBy("o_orderpriority")
    )


Q19_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q20 exact percentiles (interpolated quantiles — Spark `percentile` and
# DuckDB `quantile_cont` share the linear-interpolation definition on
# DOUBLE inputs; results are rounded to 4 decimals so low-order IEEE bits
# from the interpolation arithmetic cannot break hash equality).  Exact
# quantiles need the full sorted group — at 100 TB swap in
# `approx_percentile` (t-digest sketch, map-side combinable); the exact
# twin stays as the correctness anchor.
# --------------------------------------------------------------------------
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile(price, F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile(price, F.lit(0.5)), 4).alias("med"),
            F.round(F.percentile(price, F.lit(0.9)), 4).alias("p90"),
            F.min(price).alias("lo"),
            F.max(price).alias("hi"),
        )
        .orderBy("o_orderstatus")
    )


Q20_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 4) AS p25,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS med,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 4) AS p90,
       min(CAST(o_totalprice AS DOUBLE)) AS lo,
       max(CAST(o_totalprice AS DOUBLE)) AS hi
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Q21 array functions + explode (LATERAL-unnest surface): token frequency
# over documents — split/lower/explode are all codegen'd; the only shuffle
# is the token-count groupBy (map-side combined), then TakeOrderedAndProject.
# --------------------------------------------------------------------------
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(100)
    )


def _q21_sql() -> str:
    from ..functions.text import TOKENS_SQL

    t = TOKENS_SQL.format(col="text")
    return f"""
SELECT tok, count(*) AS n
FROM (SELECT unnest({t}) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 explicit GROUPING SETS + grouping_id (generalizes Q9 rollup/cube;
# grouping_id disambiguates aggregation-NULL from data-NULL — the same
# contract Flink SQL exposes to the reference's users)
# --------------------------------------------------------------------------
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q22_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --------------------------------------------------------------------------
# Q23 TPC-H Q3 shape: selective dims filter a two-fact join, ranked output.
# customer(filtered) broadcasts into orders(filtered), lineitem joins on the
# shuffled order key; revenue aggregated in exact decimals, top-10 by
# TakeOrdered.  The canonical "shipping priority" plan at any scale: the
# only big shuffle is lineitem on o_orderkey.
# --------------------------------------------------------------------------
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cut = "1995-03-15"
    c = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(
        F.col("o_orderdate") < F.lit(f"{cut} 00:00:00").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = lineitem.filter(
        F.col("l_shipdate") > F.lit(f"{cut} 00:00:00").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q23_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# Q24 TPC-H Q5 shape: local-supplier volume — the 6-table join.  All four
# dims (region→nation→customer/supplier) broadcast; the only big shuffle is
# lineitem ⋈ orders on the order key.  The c_nationkey = s_nationkey
# constraint lands as a post-join filter between two broadcast columns —
# free at any scale.
# --------------------------------------------------------------------------
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    r = region.filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    s = supplier.select("s_suppkey", F.col("s_nationkey").alias("s_nat"))
    cut_lo = F.lit("1994-01-01 00:00:00").cast("timestamp_ntz")
    cut_hi = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    o = orders.filter(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    ).select("o_orderkey", "o_custkey")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("c_nat") == F.col("s_nat"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q24_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two nations,
    per (supplier nation, customer nation, ship year), both directions.

    Plan shape: fact-side lineitem→orders shuffle join; supplier and the
    customer→nation side both collapse to broadcast maps (supplier and
    customer are dims at any scale relative to lineitem); the nation-pair
    predicate is applied AFTER both nation keys are attached (4 rows of
    name pairs would broadcast, but the filter on two attached columns is
    free).  One final 3-key hash aggregation."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pair = ("NATION_1", "NATION_2")
    n = nation.filter(F.col("n_name").isin(*pair)).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    cut_lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    volume = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= cut_lo) & (F.col("l_shipdate") < cut_hi)
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q25_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returned items in a quarter.

    Plan shape: the returnflag + order-date filters push into the two
    fact scans; customer→nation collapses to a broadcast; lineitem⋈orders
    is the only real shuffle; the top 20 compiles to
    TakeOrderedAndProject (no global sort)."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    c = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    cut_lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1995-04-01 00:00:00").cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    ).select("o_orderkey", "o_custkey")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q26_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of a month's revenue from
    PROMO-type parts.  Part side broadcasts; the single-row percentage is
    computed as one double division of two exact decimal sums, rounded to
    6 — identical expression order in the oracle."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cut_lo = F.lit("1995-09-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1995-10-01 00:00:00").cast("timestamp")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    joined = (
        lineitem.filter(
            (F.col("l_shipdate") >= cut_lo) & (F.col("l_shipdate") < cut_hi)
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(
            F.lit(0).cast(DEC)
        )).alias("promo"),
        F.sum(revenue).alias("total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("promo").cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


Q27_SQL = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed k
    orders, including the zero bucket (LEFT join).

    Plan shape: one shuffle join on custkey (orders side projected to one
    column), per-customer count (re-uses the join partitioning — no
    second exchange for the first groupBy), then a tiny second hash agg
    over ≤ max-order-count rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q28_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): revenue gain if discounts in
    a band had been eliminated for small-quantity lineitems in one year.

    Plan shape: the three predicates all push into the parquet scan
    (shipdate range + quantity + discount band), one partial+final
    aggregate, zero joins, zero wide exchanges — the canonical
    scan-dominated query.  At 100 TB this is bounded by scan bandwidth
    and the pushed filters skip whole row groups on shipdate min/max."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    cut_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= cut_lo)
            & (F.col("l_shipdate") < cut_hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


Q29_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3 suppliers' share of
    AMERICA-region customers' ECONOMY-part order volume, per order year.

    Plan shape: part (type filter), supplier→nation, and
    customer→nation→region all collapse to broadcasts; the only real
    shuffles are lineitem⋈orders on orderkey and the final 2-row year
    aggregate.  The share is one IEEE double division of two exact
    decimal sums (identical expression order in the oracle)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    amer_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(amer_nations),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    econ_parts = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    cut_lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    volume = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    joined = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(econ_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "semi")
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("nation_volume"),
        F.sum(volume).alias("total_volume"),
    )
    return agg.select(
        F.col("o_year").cast("int").alias("o_year"),
        F.round(
            F.col("nation_volume").cast("double")
            / F.col("total_volume").cast("double"),
            6,
        ).alias("mkt_share"),
    ).orderBy("o_year")


Q30_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum revenue in
    one quarter.

    Plan shape: one shipdate-filtered scan → per-supplier decimal
    aggregate; the scalar max re-aggregates the (already tiny)
    supplier-grained result into ONE row that broadcasts back as an
    equality join — no unpartitioned window over the revenue table, so
    the pattern survives a supplier dimension of any size.  Decimal
    equality is exact (no double compare at the max boundary)."""
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cut_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= cut_lo) & (F.col("l_shipdate") < cut_hi)
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
            ).alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("total_revenue"))
    return (
        revenue.join(F.broadcast(top), "total_revenue")
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q31_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds a threshold, with their customers, top 100 by price.

    Plan shape: the HAVING filter runs on the per-order aggregate BEFORE
    any join (orders-grained, heavily reduced), then joins orders and a
    broadcast-joined customer dim; top-100 compiles to
    TakeOrderedAndProject.  Quantities are integral doubles → the decimal
    cast and sum are exact on both engines."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(250).cast(DEC))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q32_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (small-quantity-order revenue): yearly revenue
    lost if orders below 20% of a part's average quantity were not
    filled.  Adapted: the brand filter stands in for TPC-H's
    brand+container pair (no p_container column in this schema).

    Determinism note: ``qty < 0.2·avg(qty)`` is evaluated MULTIPLIED
    THROUGH as ``qty·5·cnt < sum_qty`` — exact decimal/integer
    arithmetic on both engines, no engine-specific decimal-average
    scale rules anywhere.  Plan: brand parts broadcast into the lineitem
    scan, one per-part aggregate, one rejoin keyed on partkey."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    bp = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            _dec("l_quantity").alias("q"),
            _dec("l_extendedprice").alias("ep"),
        )
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum("q").alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("q") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            (F.sum("ep").cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


Q33_SQL = """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
li AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS ep
  FROM lineitem JOIN bp ON l_partkey = p_partkey
),
pa AS (SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS cnt
       FROM li GROUP BY l_partkey)
SELECT CAST(SUM(li.ep) AS DOUBLE) / 7.0 AS avg_yearly
FROM li JOIN pa USING (l_partkey)
WHERE li.q * 5 * pa.cnt < pa.sq
"""


def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (global sales opportunity): wealthy idle
    accounts — customers whose balance exceeds the average POSITIVE
    balance and who have placed no order since 2000, grouped by nation.
    Adapted: nation key stands in for TPC-H's phone country code (no
    c_phone column), and "no recent order" for "no order ever" (every
    synthetic customer has some order).

    The average comparison is multiplied through (``bal·n > sum``) —
    exact decimals, no division; the 1-row positive-balance aggregate
    broadcasts (the documented 1-row crossJoin class), and the recency
    check is a left-anti join against the date-filtered orders scan."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    rich = customer.crossJoin(F.broadcast(pos)).filter(
        _dec("c_acctbal") * F.col("n") > F.col("s")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


Q34_SQL = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
),
rich AS (
  SELECT c.* FROM customer c, pos
  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM rich r
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = r.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (order priority checking): orders placed in one
    quarter that had at least one line shipped more than 60 days after
    the order date, counted by priority.  Adapted: ``l_shipdate >
    o_orderdate + 60 days`` stands in for TPC-H's ``l_commitdate <
    l_receiptdate`` (no commit/receipt columns in this schema).

    Plan: the date-filtered orders scan LEFT SEMI joins lineitem on
    (orderkey, late-ship) — Catalyst plans the semi join with the equi
    part as the join key and the interval comparison as a post-join
    condition, so the shuffle is keyed, never a nested loop."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q35_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (shipping modes / order priority): for lines
    shipped in 1998, per line status (standing in for l_shipmode, which
    this schema lacks) count lines of high-priority vs other orders.

    Plan: one keyed join orders⋈lineitem (both sides shuffle on
    orderkey — at scale this is THE join to co-bucket), then a two-row
    conditional aggregate with map-side partials."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q36_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (suppliers who kept orders waiting): suppliers
    whose line was late on a finished multi-supplier order where NO
    other supplier's line was late.  Adapted: "late" is ``l_shipdate >
    o_orderdate + 90 days`` (no commit/receipt columns).

    Plan: the late-line set is one orders⋈lineitem keyed join; the
    exists / not-exists pair are a LEFT SEMI and a LEFT ANTI join on
    orderkey with the supplier-inequality as join condition — all three
    joins share the orderkey shuffle key (one co-partitioning at scale),
    and the supplier dimension broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        li.join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waiting = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy("s_name")
    )


Q37_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY s_name
"""


def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (discounted revenue, disjunctive predicates):
    revenue over an OR of three (brand, size-range, quantity-range)
    predicate triples.  Adapted: p_size ranges stand in for the
    container lists (no p_container column).

    Plan check (tests/test_plans.py class): the partkey equi-join stays
    a hash join with the disjunction evaluated post-join — Catalyst must
    NOT fall back to a nested loop because of the OR."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    triple = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return j.filter(triple).agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast(DEC) - _dec("l_discount"))
        )
        .cast("double")
        .alias("revenue")
    )


Q38_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (product-type profit by nation and year):
    revenue from lines of color-named parts, grouped by the SUPPLIER's
    nation and the order year.  Adapted: revenue only (this schema has
    no partsupp/ps_supplycost to subtract), ``p_name LIKE '%red%'``.

    Plan: part filter + supplier + nation broadcast into the lineitem
    scan (three broadcast joins, zero fact shuffles before the agg);
    orders joins keyed on orderkey; one grouped aggregate."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    sn = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        lineitem.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast(DEC) - _dec("l_discount"))
            )
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q39_SQL = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


#: name -> (query builder, oracle SQL)
RELATIONAL_QUERIES = {
    "q01_project_scalar": (q1, Q1_SQL),
    "q02_filter": (q2, Q2_SQL),
    "q03_group_agg": (q3, Q3_SQL),
    "q04_count_distinct": (q4, Q4_SQL),
    # HLL sketches differ across engines → rows-only; error bounded in tests
    "q04b_approx_distinct": (q4b, None),
    "q05_join_agg": (q5, Q5_SQL),
    "q06_multijoin_broadcast": (q6, Q6_SQL),
    "q07a_outer_null": (q7a, Q7A_SQL),
    "q07b_semi_join": (q7b, Q7B_SQL),
    "q07c_anti_join": (q7c, Q7C_SQL),
    "q08_wide_agg": (q8, Q8_SQL),
    "q09_rollup": (q9, Q9_SQL),
    "q09b_cube": (q9b, Q9B_SQL),
    "q10a_topk_window": (q10a, Q10A_SQL),
    "q10b_running_sum": (q10b, Q10B_SQL),
    "q11_topk": (q11, Q11_SQL),
    "q12a_intersect": (q12a, Q12A_SQL),
    "q12b_except": (q12b, Q12B_SQL),
    "q12c_union_agg": (q12c, Q12C_SQL),
    "q13_scalars": (q13, Q13_SQL),
    "q14_changelog_materialize": (q14, Q14_SQL),
    "q14b_changelog_maxby": (q14b, Q14_SQL),
    "q15_op_breakdown": (q15, Q15_SQL),
    "q16_tumbling_window": (q16, Q16_SQL),
    "q17_json_extract": (q17, Q17_SQL),
    "q18_correlated_subquery": (q18, Q18_SQL),
    "q19_pivot": (q19, Q19_SQL),
    "q20_percentiles": (q20, Q20_SQL),
    "q21_token_freq": (q21, _q21_sql()),
    "q22_grouping_sets": (q22, Q22_SQL),
    "q23_shipping_priority": (q23, Q23_SQL),
    "q24_local_supplier_volume": (q24, Q24_SQL),
    "q25_volume_shipping": (q25, Q25_SQL),
    "q26_returned_items": (q26, Q26_SQL),
    "q27_promo_effect": (q27, Q27_SQL),
    "q28_customer_distribution": (q28, Q28_SQL),
    "q29_forecast_revenue": (q29, Q29_SQL),
    "q30_market_share": (q30, Q30_SQL),
    "q31_top_supplier": (q31, Q31_SQL),
    "q32_large_volume_customer": (q32, Q32_SQL),
    "q33_small_qty_revenue": (q33, Q33_SQL),
    "q34_sales_opportunity": (q34, Q34_SQL),
    "q35_order_priority_check": (q35, Q35_SQL),
    "q36_shipmode_priority": (q36, Q36_SQL),
    "q37_waiting_suppliers": (q37, Q37_SQL),
    "q38_disjunctive_revenue": (q38, Q38_SQL),
    "q39_nation_profit": (q39, Q39_SQL),
}
