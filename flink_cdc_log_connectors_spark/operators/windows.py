"""Flink SQL window-TVF parity: HOP (sliding) and CUMULATE windows.

The reference's users aggregate CDC/event streams with Flink's window TVFs
(``TUMBLE`` / ``HOP`` / ``CUMULATE`` — flink-sql window TVF surface the
connector docs demonstrate; tumbling is already covered by q16 and session
windows by ``sessionize_events``).  Batch form here; the streaming twins are
Structured Streaming's ``F.window(ts, size, slide)`` (hop) and the
per-window-end union (cumulate), tested in ``tests/test_streaming.py``.

Spark-first formulation — assignment, not self-joins: each event computes
the (bounded, size/slide-many) windows it belongs to with pure integer
epoch arithmetic and ``explode(sequence(...))``, then one hash aggregation
on (window, key).  At 100 TB the explode is a map-side fan-out of factor
size/slide (4 here) with partial aggregation combining BEFORE the shuffle,
so bytes shuffled are O(distinct windows × keys), not O(events × factor).
No window-function sort, no range join.

All sums are exact DECIMAL(18,2) (cast double only at the output edge), so
the DuckDB oracles hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime import epoch_seconds
from ..io import load_table

_EPOCH = "timestamp_ntz'1970-01-01 00:00:00'"


def hop_window(
    df: DataFrame, ts_col: str, slide_seconds: int, size_seconds: int
) -> DataFrame:
    """Assign each row to every HOP(slide, size) window containing it.

    A row at epoch-second ``s`` belongs to the ``size/slide`` windows whose
    aligned starts lie in ``(s - size, s]``.  Adds ``window_start`` /
    ``window_end`` (TIMESTAMP_NTZ); one input row fans out to exactly
    ``size/slide`` rows.
    """
    if size_seconds % slide_seconds != 0:
        raise ValueError("size must be a multiple of slide")
    s = epoch_seconds(ts_col)
    aligned = s - F.pmod(s, F.lit(slide_seconds))
    first = aligned - F.lit(size_seconds - slide_seconds)
    out = df.select(
        "*",
        F.explode(
            F.sequence(first, aligned, F.lit(slide_seconds))
        ).alias("__ws"),
    )
    return (
        out.withColumn(
            "window_start", F.expr(f"timestampadd(SECOND, __ws, {_EPOCH})")
        )
        .withColumn(
            "window_end",
            F.expr(f"timestampadd(SECOND, __ws + {size_seconds}, {_EPOCH})"),
        )
        .drop("__ws")
    )


def cumulate_window(
    df: DataFrame, ts_col: str, step_seconds: int, size_seconds: int
) -> DataFrame:
    """Assign each row to its CUMULATE(step, size) windows: expanding
    prefixes ``[window_start, window_start + k*step)`` of the enclosing
    ``size``-wide window — Flink's early-firing cumulative aggregation as a
    batch TVF.  A row at second ``s`` appears in every prefix whose end is
    after ``s``: ends from ``step_ceil(s)`` through ``size_floor(s)+size``.
    """
    if size_seconds % step_seconds != 0:
        raise ValueError("size must be a multiple of step")
    s = epoch_seconds(ts_col)
    ws = s - F.pmod(s, F.lit(size_seconds))
    first_end = s - F.pmod(s, F.lit(step_seconds)) + F.lit(step_seconds)
    out = df.select(
        "*",
        (ws).alias("__wstart"),
        F.explode(
            F.sequence(first_end, ws + F.lit(size_seconds), F.lit(step_seconds))
        ).alias("__we"),
    )
    return (
        out.withColumn(
            "window_start", F.expr(f"timestampadd(SECOND, __wstart, {_EPOCH})")
        )
        .withColumn(
            "window_end", F.expr(f"timestampadd(SECOND, __we, {_EPOCH})")
        )
        .drop("__wstart", "__we")
    )


# --------------------------------------------------------------------------
# registry queries
# --------------------------------------------------------------------------

HOP_SLIDE_S = 900
HOP_SIZE_S = 3600


def hop_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes over the events stream."""
    events = load_table(spark, sf_dir, "events")
    return (
        hop_window(events, "ts", HOP_SLIDE_S, HOP_SIZE_S)
        .groupBy("window_start", "window_end", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum"),
        )
        .orderBy("window_start", "event_type")
        .limit(4000)
    )


# DuckDB: pmod(s, m) for possibly-negative s is ((s % m) + m) % m
def _pmod_sql(s: str, m: int) -> str:
    return f"((({s}) % {m}) + {m}) % {m}"


def _hop_sql() -> str:
    sl, sz = HOP_SLIDE_S, HOP_SIZE_S
    return f"""
WITH e AS (
  SELECT event_type, value,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
  FROM events
),
w AS (
  SELECT event_type, value,
         unnest(generate_series(
           s - {_pmod_sql("s", sl)} - {sz - sl},
           s - {_pmod_sql("s", sl)}, {sl})) AS ws
  FROM e
)
SELECT make_timestamp(ws * 1000000) AS window_start,
       make_timestamp((ws + {sz}) * 1000000) AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type LIMIT 4000
"""


CUM_STEP_S = 900
CUM_SIZE_S = 3600


def cumulate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative 15-minute prefixes of each hour (Flink CUMULATE TVF)."""
    events = load_table(spark, sf_dir, "events")
    return (
        cumulate_window(events, "ts", CUM_STEP_S, CUM_SIZE_S)
        .groupBy("window_start", "window_end", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum"),
        )
        .orderBy("window_start", "window_end", "event_type")
        .limit(4000)
    )


def _cumulate_sql() -> str:
    st, sz = CUM_STEP_S, CUM_SIZE_S
    return f"""
WITH e AS (
  SELECT event_type, value,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
  FROM events
),
w AS (
  SELECT event_type, value,
         s - {_pmod_sql("s", sz)} AS wstart,
         unnest(generate_series(
           s - {_pmod_sql("s", st)} + {st},
           s - {_pmod_sql("s", sz)} + {sz}, {st})) AS we
  FROM e
)
SELECT make_timestamp(wstart * 1000000) AS window_start,
       make_timestamp(we * 1000000) AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
FROM w GROUP BY 1, 2, 3
ORDER BY window_start, window_end, event_type LIMIT 4000
"""


SESSION_GAP_S = 1800


def session_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SESSION window TVF via Spark's NATIVE ``session_window``
    grouping (the engine's hand-rolled gaps-and-islands twin is
    ``sessionize_events``; this entry proves the built-in operator agrees
    with the same arithmetic oracle).  Semantics under test: windows
    merge while each event starts strictly BEFORE the running window's
    end (so a gap of exactly 30 min starts a new session — half-open
    windows), and the final end is last-event + gap at full microsecond
    precision.

    Scale: one hash shuffle on the session key; Spark merges windows
    with a per-key sort inside the aggregation — no self-join, no
    driver state."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_S} seconds"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n",
            "v_sum",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_SQL = f"""
WITH seq AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts)
                   >= {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
isl AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
FROM isl GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


WINDOW_QUERIES = {
    "events_hop_window": (hop_query, _hop_sql()),
    "events_cumulate_window": (cumulate_query, _cumulate_sql()),
    "events_session_window_tvf": (session_window_query, SESSION_WINDOW_SQL),
}
