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


def test_bucket_first_last_and_delta(spark):
    import datetime

    from flink_cdc_log_connectors_spark.operators.hypertable import (
        bucket_delta,
        bucket_first_last,
        rollup_fine,
    )

    d = lambda m, s=0: datetime.datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    rows = [
        # bucket 0 (minutes 0-59): first=10.0@(0,1), last=30.0@(5,9)
        (1, d(0), "a", 10.0),
        (9, d(5), "a", 30.0),
        (5, d(3), "a", 20.0),
        # bucket 1: single event
        (7, datetime.datetime(2024, 1, 1, 1, 1), "a", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    fl = {str(r["bucket"]): (r["first_value"], r["last_value"], r["n"])
          for r in bucket_first_last(df, 3600).collect()}
    assert fl["2024-01-01 00:00:00"] == (10.0, 30.0, 3)
    assert fl["2024-01-01 01:00:00"] == (7.0, 7.0, 1)

    deltas = {str(r["bucket"]): r["delta"]
              for r in bucket_delta(rollup_fine(df, 3600)).collect()}
    # bucket0 sum=60, bucket1 sum=7 → delta None then -53
    vals = sorted((k, v) for k, v in deltas.items())
    assert vals[0][1] is None and float(vals[1][1]) == -53.0


def test_bucket_first_last_tie_on_same_ts(spark):
    import datetime

    from flink_cdc_log_connectors_spark.operators.hypertable import (
        bucket_first_last,
    )

    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(2, t, "a", 5.0), (1, t, "a", 9.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    r = bucket_first_last(df, 3600).collect()[0]
    # equal ts: event_id breaks the tie deterministically
    assert (r["first_value"], r["last_value"]) == (9.0, 5.0)


def test_largest_triangle_downsample_selection(spark):
    import datetime

    from flink_cdc_log_connectors_spark.operators.hypertable import (
        largest_triangle_downsample,
    )

    d = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        # bucket 0 (hour 0): first bucket → earliest point (id 1) kept
        (1, d(0, 5), "a", 1.0),
        (2, d(0, 40), "a", 99.0),
        # bucket 1 (hour 1): interior — neighbors avg flat at v=50-ish;
        # the spike (id 4, v=100) forms the largest triangle
        (3, d(1, 10), "a", 50.0),
        (4, d(1, 30), "a", 100.0),
        (5, d(1, 50), "a", 50.0),
        # bucket 2 (hour 2): last bucket → latest point (id 7) kept
        (6, d(2, 10), "a", 50.0),
        (7, d(2, 20), "a", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {str(r["bucket"]): r["event_id"]
           for r in largest_triangle_downsample(df, 3600).collect()}
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 4,
        "2024-01-01 02:00:00": 7,
    }
