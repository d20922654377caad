"""TimescaleDB-toolkit parity ops (time_weight / counter_agg / state_agg)
on hand-computed fixtures — the oracle run in scripts/selfcheck.py covers
the real tables; these pin the edge semantics (bucket-boundary clipping,
resets, open final interval)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.operators.hypertable import (
    counter_delta,
    state_durations,
    time_weighted_average,
)


def _events(spark, rows):
    # rows: (seconds_from_epoch, key, value, event_id)
    df = spark.createDataFrame(
        rows, "s long, event_type string, value double, event_id long"
    )
    return df.withColumn(
        "ts",
        F.expr("timestampadd(SECOND, s, timestamp_ntz'1970-01-01 00:00:00')"),
    )


def test_time_weight_clips_midnight_spanning_segment(spark):
    # 23:00 d0 v=10  →  01:00 d1 v=30  →  02:00 d1 (v=50, open, no weight)
    # d0: 1h of 10 → twa 10;  d1: 1h of 10 + 1h of 30 → twa 20
    ev = _events(
        spark,
        [
            (23 * 3600, "a", 10.0, 1),
            (25 * 3600, "a", 30.0, 2),
            (26 * 3600, "a", 50.0, 3),
        ],
    )
    out = {
        int(r["bucket"].timestamp() if hasattr(r["bucket"], "timestamp") else 0)
        // 86400: (r["twa"], r["weight_us"])
        for r in time_weighted_average(ev).collect()
    }
    assert out[0] == (10.0, 3_600_000_000)
    assert out[1] == (20.0, 7_200_000_000)


def test_time_weight_drops_zero_length_and_open_segments(spark):
    # two observations at the identical microsecond: the earlier (by
    # event_id) one's segment is zero-length and contributes nothing;
    # the final observation is an open interval and contributes nothing.
    ev = _events(
        spark,
        [(0, "a", 99.0, 1), (0, "a", 10.0, 2), (3600, "a", 30.0, 3)],
    )
    rows = time_weighted_average(ev).collect()
    assert len(rows) == 1
    assert rows[0]["twa"] == 10.0
    assert rows[0]["weight_us"] == 3_600_000_000


def test_counter_delta_counts_resets_from_zero(spark):
    # 5 → 7 (+2) → 3 (reset, +3) → 10 (+7): total 12, one reset
    ev = _events(
        spark,
        [(0, "c", 5.0, 1), (1, "c", 7.0, 2), (2, "c", 3.0, 3), (3, "c", 10.0, 4)],
    )
    r = counter_delta(ev).collect()[0]
    assert r["total_increase"] == 12.0
    assert r["num_resets"] == 1
    assert r["n_points"] == 4


def test_state_durations_open_final_state_excluded(spark):
    # user u: A@0 B@10 A@25 C@40 — C has no successor → no duration
    rows = [
        (0, "A", 0.0, 1),
        (10, "B", 0.0, 2),
        (25, "A", 0.0, 3),
        (40, "C", 0.0, 4),
    ]
    df = spark.createDataFrame(
        [(1, s, t, eid) for s, t, _, eid in rows],
        "user_id long, s long, event_type string, event_id long",
    ).withColumn(
        "ts",
        F.expr("timestampadd(SECOND, s, timestamp_ntz'1970-01-01 00:00:00')"),
    )
    out = {
        (r["user_id"], r["state"]): (r["state_us"], r["n_entries"])
        for r in state_durations(df).collect()
    }
    assert out == {
        (1, "A"): (25_000_000, 2),
        (1, "B"): (15_000_000, 1),
    }
