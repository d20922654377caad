"""As-of join and SCD2 semantics on hand-computed fixtures."""

from __future__ import annotations

from flink_cdc_log_connectors_spark.operators.temporal import asof_join, scd2_history


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 55.0)],
        "sym int, t long, px double",
    )
    trades = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 25), (2, 14), (3, 50)],
        "sym int, t long",
    )
    out = asof_join(
        trades, quotes,
        left_on="sym", right_on="sym",
        left_time="t", right_time="t",
        value_cols=["px"],
    )
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    assert got == {
        (1, 5): None,     # before any quote
        (1, 10): 100.0,   # equal timestamp counts (right sorts first)
        (1, 25): 101.0,   # latest preceding
        (2, 14): None,
        (3, 50): None,    # key with no right rows at all
    }


def test_asof_join_tie_break(spark):
    # two right rows at the same time: the higher tie-break wins (last)
    quotes = spark.createDataFrame(
        [(1, 10, 1, 100.0), (1, 10, 2, 200.0)], "sym int, t long, seq long, px double"
    )
    trades = spark.createDataFrame([(1, 10)], "sym int, t long")
    out = asof_join(
        trades, quotes,
        left_on="sym", right_on="sym",
        left_time="t", right_time="t",
        value_cols=["px"], tie_break=["seq"],
    ).collect()
    assert out[0]["px"] == 200.0


def test_scd2_history(spark):
    log = spark.createDataFrame(
        [
            (1, "a", "c", 10),
            (1, "b", "u", 20),
            (1, None, "d", 30),
            (2, "x", "c", 15),
        ],
        "id int, v string, op string, ts long",
    )
    hist = scd2_history(log, keys=["id"], order_by=["ts"], ts_col="ts").collect()
    by = {(r["id"], r["valid_from"]): r for r in hist}
    assert by[(1, 10)]["valid_to"] == 20 and not by[(1, 10)]["is_current"]
    assert by[(1, 20)]["valid_to"] == 30 and not by[(1, 20)]["is_current"]
    # delete closes the key: final row is not current and flagged deleted
    assert by[(1, 30)]["valid_to"] is None
    assert not by[(1, 30)]["is_current"] and by[(1, 30)]["is_deleted"]
    assert by[(2, 15)]["is_current"]


def test_time_bucket_floors_pre_epoch(spark):
    # div truncates toward zero and would upper-align pre-epoch buckets;
    # the pmod form must floor exactly like DuckDB's // (ADVICE r1).
    from flink_cdc_log_connectors_spark.operators.hypertable import time_bucket

    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '1969-12-31 23:59:59' AS ts "
        "UNION ALL SELECT TIMESTAMP_NTZ '1970-01-01 00:00:01' "
        "UNION ALL SELECT TIMESTAMP_NTZ '1969-12-31 22:00:00'"
    )
    got = sorted(
        str(r["b"]) for r in df.select(time_bucket(3600, "ts").alias("b")).collect()
    )
    assert got == [
        "1969-12-31 22:00:00",
        "1969-12-31 23:00:00",
        "1970-01-01 00:00:00",
    ]
