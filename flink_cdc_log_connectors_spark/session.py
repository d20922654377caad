"""SparkSession factory tuned for the engine.

Defaults are scale-aware: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow on (fast Pandas-UDF path), UTC session timezone
(oracle comparability with DuckDB's naive timestamps).  ``shuffle_partitions``
defaults to the local core count for local mode; on a real cluster callers
should pass ``spark.sql.shuffle.partitions`` sized to ~2-3x total cores or
rely on AQE coalescing from a higher initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "flink_cdc_log_connectors_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults applied."""
    cores = _local_cores()
    master = master or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # PySpark wraps EVERY DataFrame/Column API call in a call-site
        # capture (Python stack walk + two py4j round-trips to stash the
        # origin for error enrichment).  The foreachBatch consumers make
        # thousands of such calls per epoch, where it profiled at ~5-10%
        # of witness wall-clock (r13, cProfile: 555 wrapped calls/run =
        # _capture_call_site 0.27s + origin set round-trips).  Scale-
        # independent driver-overhead toggle — costs only error-message
        # call-site detail.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
