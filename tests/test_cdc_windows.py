"""Windowed aggregation directly over the cdclog streaming source —
the reference users' `GROUP BY window` over a CDC table, end-to-end."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fixtures import PRODUCTS_PHYSICAL, write_fixture
from flink_cdc_log_connectors_spark.streaming.pipeline import (
    read_cdc_stream,
    windowed_counts,
)


def test_windowed_counts_over_cdc_stream(spark, tmp_path):
    base = tmp_path / "fix"
    write_fixture(str(base))
    stream = read_cdc_stream(
        spark, str(base), PRODUCTS_PHYSICAL, starting_offsets="earliest"
    )
    # event time from the change's commit timestamp
    stream = stream.withColumn(
        "ts", F.timestamp_millis(F.col("_src.op_ts_ms"))
    )
    agg = windowed_counts(
        stream, "ts", window="2 seconds", watermark="10 seconds", group_cols=["op"]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("cdc_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # fixture: 7 changes at 1s intervals; updates emit 2 rows each.
    # append mode emits only watermark-closed windows — assert the emitted
    # prefix is correct per op
    rows = spark.sql("SELECT * FROM cdc_win").collect()
    got = {}
    for r in rows:
        got[(r["w"]["start"].isoformat(), r["op"])] = r["n"]
    # all closed windows hold 'u' pairs or single c/d rows; total rows
    # across closed windows must be a multiple of the emission pattern
    assert all(n >= 1 for n in got.values())
    assert sum(n for (_, op), n in got.items() if op == "u") % 2 == 0
