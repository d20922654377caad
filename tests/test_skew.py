"""Skew mitigation + bucketing: results must equal the naive plans, and
bucketed joins must drop the exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.operators.skew import (
    salted_agg,
    salted_join,
    write_bucketed,
)
from flink_cdc_log_connectors_spark.plans.inspect import count_exchanges


def test_salted_agg_matches_naive(spark):
    # hot key 1 has 10k rows, others 10
    rows = [(1, float(i % 7)) for i in range(10_000)] + [
        (k, float(k)) for k in range(2, 12) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "k int, v double")
    naive = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")}
        ).collect()
    }
    assert naive == salted


def test_salted_join_matches_naive(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(5000)] + [(2, 0), (3, 1)], "k int, payload int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "a"), (4, "unused")], "k int, v string")
    naive = sorted(
        (r["k"], r["payload"], r["v"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["v"]) for r in salted_join(big, small, "k").collect()
    )
    assert naive == salted
    assert len(naive) == 5001


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
        b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
        write_bucketed(a, "bk_a", ["id"], num_buckets=4)
        write_bucketed(b, "bk_b", ["id"], num_buckets=4)
        joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
        n_exchange = count_exchanges(joined)
        assert joined.count() == 1000
        assert n_exchange == 0, "bucketed equi-join must not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_time_partitioned_layout_prunes_partitions(spark, tmp_path):
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.operators.skew import (
        read_time_range,
        write_time_partitioned,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(events, path, "ts")
    full = spark.read.parquet(path)
    days = sorted(r["__part"] for r in full.select("__part").distinct().collect())
    assert len(days) > 3  # the fixture spans multiple days
    one_day = read_time_range(
        spark, path, "ts", str(days[1]), str(days[2])
    )
    # partition pruning: the __part predicate must reach the scan as a
    # partition filter (pruned at file-listing time, before any IO), and
    # the ts range must be pushed into parquet row-group filters
    from flink_cdc_log_connectors_spark.plans.inspect import formatted_plan

    plan = formatted_plan(one_day)
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "__part" in part_line and "[]" not in part_line.replace(" ", "")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "ts" in pushed
    # correctness: same rows as an unpartitioned filter
    import pyspark.sql.functions as F

    expected = events.filter(
        (F.col("ts") >= F.lit(str(days[1])).cast("timestamp"))
        & (F.col("ts") < F.lit(str(days[2])).cast("timestamp"))
    ).count()
    assert one_day.count() == expected


def test_zorder_key_interleaves_bits(spark):
    from flink_cdc_log_connectors_spark.operators.skew import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3), (5, 9)],
        "x long, y long",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)


def test_zorder_layout_locality(spark, tmp_path):
    """Sorting by the Morton key bounds the per-file value ranges of BOTH
    dimensions: each written file's (x, y) spans are fractions of the
    global span — the property zone-map pruning relies on."""
    import glob

    from flink_cdc_log_connectors_spark.operators.skew import write_zordered

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(4)
    out = str(tmp_path / "z")
    write_zordered(df.coalesce(1), out, "x", "y")
    # read each parquet file independently and measure its x/y spans
    files = [f for f in glob.glob(out + "/*.parquet")]
    assert files
    import pyarrow.parquet as pq

    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            cols = {md.row_group(rg).column(i).path_in_schema:
                    md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)}
            sx = cols["x"]; sy = cols["y"]
            if md.num_row_groups > 1:
                assert sx.max - sx.min <= n // 2 or sy.max - sy.min <= n // 2


def test_changelog_hotkey_agg_matches_window_and_is_partial(spark):
    """The max_by materialization equals the row_number window on a
    hot-key log (one key = 10% of events, deletes included), and its
    physical plan carries a partial (map-side) aggregate so the hot key
    collapses to one candidate per partition before the exchange."""
    from flink_cdc_log_connectors_spark.operators.changelog import (
        apply_changelog,
        apply_changelog_agg,
    )

    rows = [(-1, i, float(i % 97), "u") for i in range(0, 5000, 10)]
    rows += [(i % 37, i, float(i), "d" if i % 500 == 1 else "u")
             for i in range(5000) if i % 10 != 0]
    log = spark.createDataFrame(rows, "k int, seq long, v double, op string")
    win = {
        r["k"]: (r["seq"], r["v"])
        for r in apply_changelog(log, ["k"], ["seq"]).collect()
    }
    agg = {
        r["k"]: (r["seq"], r["v"])
        for r in apply_changelog_agg(log, ["k"], ["seq"]).collect()
    }
    assert win == agg and -1 in agg
    plan = (
        apply_changelog_agg(log, ["k"], ["seq"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower()


def test_bucketed_changelog_has_no_exchange(spark):
    """SCALING.md's claim for the CDC core: when the change log is
    stored bucketed by its key, BOTH materialization paths (row_number
    window and max_by aggregation) run with ZERO exchanges — the
    storage-level answer to repeated changelog materialization."""
    from flink_cdc_log_connectors_spark.operators.changelog import (
        apply_changelog,
        apply_changelog_agg,
    )

    df = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.when(F.col("id") % 11 == 0, "d").otherwise("u").alias("op"),
    )
    # a prior session may have left the warehouse dir without a catalog
    # entry (session catalogs are ephemeral; the directory is not), and
    # saveAsTable refuses an existing location it doesn't know about
    import os
    import shutil

    spark.sql("DROP TABLE IF EXISTS bk_cl_log")
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    shutil.rmtree(os.path.join(wh, "bk_cl_log"), ignore_errors=True)
    try:
        write_bucketed(df, "bk_cl_log", ["k"], num_buckets=8)
        t = spark.table("bk_cl_log")
        for out in (apply_changelog(t, ["k"], ["seq"]),
                    apply_changelog_agg(t, ["k"], ["seq"])):
            assert count_exchanges(out) == 0
        # and the two paths agree on the bucketed input
        a = sorted(map(tuple, apply_changelog(t, ["k"], ["seq"])
                       .select("k", "seq", "v").collect()))
        b = sorted(map(tuple, apply_changelog_agg(t, ["k"], ["seq"])
                       .select("k", "seq", "v").collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_cl_log")
