"""Table loading helpers for the driver's synthetic parquet tables."""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@functools.lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    timestamp type, so these are read as raw longs (nanosAsLong) and
    normalized to TIMESTAMP_NTZ at microsecond precision (same truncation
    DuckDB applies).  Footer-only inspection — no data read."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table.  Plain parquet scan — Catalyst handles column
    pruning and predicate pushdown against it (check ``PushedFilters`` /
    ``ReadSchema`` in ``.explain("formatted")``)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # Settable at runtime; the driver's own session may not carry it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # Pure TIMESTAMP_NTZ arithmetic — independent of the session timezone.
        df = df.withColumn(
            c,
            F.expr(
                f"timestampadd(MICROSECOND, {c} div 1000, timestamp_ntz'1970-01-01 00:00:00')"
            ),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
