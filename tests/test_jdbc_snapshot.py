"""End-to-end JDBC snapshot test against embedded Derby (in the Spark JVM):
probe → chunk plan → parallel predicate read — the reference's P1-P4 against
a real database."""

from __future__ import annotations

import pytest

from flink_cdc_log_connectors_spark.sources.jdbc import probe_key_stats, read_snapshot
from flink_cdc_log_connectors_spark.sources.offsets import LogOffset

URL = "jdbc:derby:memory:cdctest;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_table(spark):
    from pyspark.sql import functions as F

    df = spark.range(1, 1001).select(
        F.col("id").cast("int").alias("ID"),
        (F.col("id") % 50).cast("int").alias("BUCKET"),
        F.concat(F.lit("name-"), F.col("id")).alias("NAME"),
    )
    df.write.mode("overwrite").jdbc(URL, "APP.CUSTOMERS", properties=PROPS)
    return "APP.CUSTOMERS"


def test_probe_key_stats(spark, derby_table):
    mn, mx, cnt = probe_key_stats(spark, URL, derby_table, "ID", PROPS)
    assert (mn, mx, cnt) == (1, 1000, 1000)


def test_chunked_snapshot_reads_everything_once(spark, derby_table):
    result = read_snapshot(
        spark,
        URL,
        derby_table,
        key_col="ID",
        chunk_size=100,
        properties=PROPS,
        log_position_fn=lambda: LogOffset("wal.000", 42),
    )
    # ~10 chunks → ~10 partitions, one JDBC read each
    assert len(result.chunks) >= 8
    assert result.df.rdd.getNumPartitions() == len(result.chunks)
    rows = result.df.select("ID").collect()
    assert len(rows) == 1000
    assert len({r["ID"] for r in rows}) == 1000  # no chunk overlap
    assert result.low_watermark == LogOffset("wal.000", 42)
    assert result.high_watermark is not None


def test_snapshot_with_injected_stats_skips_probe(spark, derby_table):
    result = read_snapshot(
        spark,
        URL,
        derby_table,
        key_col="ID",
        chunk_size=500,
        properties=PROPS,
        key_stats=(1, 1000, 1000),
    )
    assert result.df.count() == 1000
    assert result.low_watermark is None
