"""Parallel JDBC snapshot reads — the reference's P1-P5 pipeline on Spark.

``read_snapshot`` is the Spark analogue of the incremental-snapshot source's
snapshot phase (reference ``JdbcIncrementalSource.java:68-131`` +
``ChunkSplitter``): probe key stats, plan chunk ranges (even shortcut or
quantile-driven), then issue ONE ``spark.read.jdbc`` with per-chunk
predicates — Spark schedules each chunk as an executor task, replacing the
enumerator/reader RPC protocol (C1/C2) with ordinary task scheduling, and
task retry replaces chunk-granular failover (P8).

Watermark capture (P5, DBLog-style lock-free consistency): for a live
database the caller supplies ``log_position_fn`` — called before and after
the partitioned read to produce the snapshot's LOW/HIGH watermarks; the
backfill merge then runs ``apply_changelog`` over snapshot ∪ log[LOW,HIGH)
(P6/P7 — see ``operators/changelog.py``).  This module has no DB-specific
code: dialects (MySQL/Postgres/Oracle/SqlServer/OceanBase §2.1 S4-S8) are
just JDBC URLs + driver jars at this layer.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .chunking import (
    DEFAULT_CHUNK_SIZE,
    ChunkRange,
    chunk_predicates,
    plan_snapshot_chunks,
    split_even,
)
from .offsets import LogOffset

#: reference defaults (MySqlSourceOptions.java:110-128)
DEFAULT_FETCH_SIZE = 1024
DEFAULT_CONNECT_TIMEOUT_S = 30


@dataclass
class SnapshotResult:
    """A consistent snapshot read plus its framing watermarks."""

    df: DataFrame
    low_watermark: LogOffset | None
    high_watermark: LogOffset | None
    chunks: list[ChunkRange]


def probe_key_stats(
    spark: SparkSession, url: str, table: str, key_col: str, properties: dict[str, str]
) -> tuple[int, int, int]:
    """MIN/MAX/COUNT of the split column via a single pushed-down JDBC query
    (the reference's ``queryMinMax`` + ``queryApproximateRowCnt``,
    ``StatementUtils.java:38-78``)."""
    probe = (
        f"(SELECT MIN({key_col}) AS mn, MAX({key_col}) AS mx, COUNT(*) AS cnt "
        f"FROM {table}) probe_q"
    )
    row = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", probe)
        .options(**properties)
        .load()
        .collect()[0]
    )
    # positional access: identifier case-folding differs per database
    return int(row[0]), int(row[1]), int(row[2])


def read_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    properties: dict[str, str] | None = None,
    log_position_fn: Callable[[], LogOffset] | None = None,
    key_stats: tuple[int, int, int] | None = None,
) -> SnapshotResult:
    """Chunked parallel snapshot of one table.

    ``key_stats`` may be injected (tests / cached planning); otherwise a
    probe query runs.  ``log_position_fn`` brackets the read with LOW/HIGH
    watermarks for the DBLog merge protocol.
    """
    props = dict(properties or {})
    props.setdefault("fetchsize", str(fetch_size))
    mn, mx, cnt = key_stats or probe_key_stats(spark, url, table, key_col, props)

    ranges = split_even(mn, mx, cnt, chunk_size)
    if ranges is None:
        # uneven: quantile-plan over the key column only (pushed projection)
        key_df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"(SELECT {key_col} FROM {table}) keys_q")
            .options(**props)
            .load()
        )
        ranges = plan_snapshot_chunks(mn, mx, cnt, chunk_size, key_df, key_col)

    low = log_position_fn() if log_position_fn else None
    df = spark.read.jdbc(
        url=url,
        table=table,
        predicates=chunk_predicates(key_col, ranges),
        properties=props,
    )
    high = log_position_fn() if log_position_fn else None
    return SnapshotResult(df=df, low_watermark=low, high_watermark=high, chunks=ranges)
