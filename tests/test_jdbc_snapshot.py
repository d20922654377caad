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


def test_offset_json_roundtrip_reserved_fields():
    """Offset JSON round-trips with and without the reserved
    gtid/skip/kind fields (reference BinlogOffset.java state), ordering
    stays (file, pos) regardless of the extras, and the no-extras wire
    form is byte-identical to the historical format."""
    import json

    plain = LogOffset("mysql-bin.000003", 4096)
    assert plain.to_json() == {"file": "mysql-bin.000003", "pos": 4096}
    assert LogOffset.from_json(plain.to_json()) == plain
    # historical payloads (no reserved keys) still parse
    assert LogOffset.from_json({"file": "f", "pos": "7"}) == LogOffset("f", 7)

    rich = LogOffset(
        "mysql-bin.000003",
        4096,
        gtid_set="24f0df4e-0:1-119",
        events_to_skip=2,
        rows_to_skip=10,
        kind="specific",
    )
    wire = json.loads(json.dumps(rich.to_json()))
    assert LogOffset.from_json(wire) == rich
    # ordering ignores the reserved fields: same (file,pos) is neither <
    # nor >, a later pos is greater even with a "smaller" gtid string
    assert not rich < plain and not plain < rich
    assert LogOffset("mysql-bin.000003", 5000) > rich
    assert sorted([rich, LogOffset("mysql-bin.000002", 9)])[0].file.endswith("2")
    # total-order CONSISTENCY: comparison, equality, and hash all use the
    # same (file, pos) key — a <= b and b <= a must imply a == b even when
    # the reserved fields differ (stop-offset equality / dedup soundness)
    assert rich <= plain and plain <= rich
    assert rich == plain and hash(rich) == hash(plain)
    assert len({rich, plain}) == 1


def test_startup_parse_edge_cases():
    """startingOffsets parsing: colons inside file names, every mode
    string, and clear errors on malformed input."""
    import pytest

    from flink_cdc_log_connectors_spark.sources.offsets import (
        StartupMode,
        StartupOptions,
    )

    s = StartupOptions.parse("file:C:/logs/mysql-bin.000001:4096")
    assert s.mode is StartupMode.SPECIFIC
    assert s.specific_offset.file == "C:/logs/mysql-bin.000001"
    assert s.specific_offset.pos == 4096

    assert StartupOptions.parse("timestamp:1700000000000").timestamp_ms == 1700000000000
    assert StartupOptions.parse("").mode is StartupMode.INITIAL
    assert StartupOptions.parse("Earliest").mode is StartupMode.EARLIEST
    assert StartupOptions.parse("LATEST").mode is StartupMode.LATEST
    with pytest.raises(ValueError):
        StartupOptions.parse("file::12")  # empty file name
    with pytest.raises(ValueError):
        StartupOptions.parse("bogus-mode")
