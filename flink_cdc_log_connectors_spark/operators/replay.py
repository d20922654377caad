"""Deterministic batch replays of the streaming CDC-join machinery.

The streaming operators (``streaming/joins.py``, ``streaming/
temporal_join.py``) are pytest-proven with memory-sink streams, but a
DuckDB value oracle cannot drive a stream — so these witnesses rebadge a
testdata table as a totally ordered CDC log, replay it through the REAL
``process_batch`` machinery in time-contiguous microbatches, and check
the materialized view against a declarative oracle.  This gives the
hardest streaming semantics (state upserts, deletes/tombstones,
incremental view maintenance) an on-the-driver-record correctness row
(VERDICT r5 next-round #7); the temporal-join twin lives in
``operators/temporal.py`` (``temporal_asof_replay``).

Reference behavior being witnessed: a continuous ``SELECT ... FROM facts
JOIN dims ...`` over two CDC tables stays current under inserts, updates
AND deletes on the dim side — the reference's flagship continuous-query
pattern (SURVEY §2.9 / §3.1, reference quickstart's orders⋈customers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

#: one replay state dir per (process, prefix, sf_dir), removed at exit —
#: repeated harness calls (bench minima, scale smoke) REUSE the dir
#: instead of leaking a fresh mkdtemp each run; safe because the replay
#: is idempotent (same epochs, keyed upserts — pytest-proven for both
#: machineries), so re-processing on top of final state reproduces the
#: same view.
_REPLAY_DIRS: dict[tuple[str, str], str] = {}


def replay_state_dir(prefix: str, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    key = (prefix, sf_dir)
    path = _REPLAY_DIRS.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix=f"{prefix}_")
        _REPLAY_DIRS[key] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def changelog_join_replay_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Replay witness for the incrementally-maintained CDC join
    (``streaming/joins.py`` ``ChangelogJoin``).

    The events table becomes one ordered change log carrying two tables:

    - dims  (``event_id % 2 == 0``): upserts of (user_id → score, ver) at
      the event timestamp; every 5th (``% 10 == 0``) is a DELETE, and
      ``% 4 == 2`` arrives as an UPDATE envelope (before+after images) —
      so the latest-state semantics face inserts, updates, deletes, and
      delete-then-reinsert sequences per key;
    - facts (``event_id % 2 == 1``): insert-only (event_id, user_id,
      value) rows joining the dim on user_id.

    Replayed through ``ChangelogJoin.process_batch`` in three
    time-contiguous microbatches (log position = microsecond rowtime —
    unique and monotone, so per-key last-write-wins agrees across batch
    boundaries).  The checked view is the final materialized inner join:
    every fact whose user's LATEST dim log entry is live (not a delete),
    enriched with that latest state — exactly the oracle's
    row_number-over-rowtime formulation.
    """
    from pyspark.sql import types as T

    from ..functions.datetime import epoch_micros
    from ..streaming.joins import ChangelogJoin, JoinSide

    fact_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    dim_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    left = JoinSide(
        table="facts", physical=fact_schema, key="event_id", join_col="user_id"
    )
    right = JoinSide(
        table="dims", physical=dim_schema, key="user_id", join_col="user_id"
    )

    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        epoch_micros("ts").alias("ts_us"),
        F.dayofmonth("ts").alias("day"),
    )

    def _src(table: str) -> Column:
        return F.struct(
            F.lit("replay").alias("db"),
            F.lit(table).alias("table"),
            F.col("ts_us").alias("ts_ms"),
            F.lit("log.0").alias("file"),
            F.col("ts_us").alias("pos"),
        )

    dim_img = F.struct(
        F.col("user_id"),
        F.col("value").alias("score"),
        F.col("event_id").alias("ver"),
    )
    # a synthetic stale before-image for the update envelopes: only its
    # presence matters (img_seq ranking must pick the after-image)
    dim_before = F.struct(
        F.col("user_id"),
        F.lit(0.0).alias("score"),
        F.lit(0).cast("long").alias("ver"),
    )
    is_del = F.col("event_id") % 10 == 0
    is_upd = (~is_del) & (F.col("event_id") % 4 == 2)
    dim_env = base.filter(F.col("event_id") % 2 == 0).select(
        F.to_json(
            F.struct(
                F.when(is_del, dim_img)
                .when(is_upd, dim_before)
                .alias("before"),
                F.when(~is_del, dim_img).alias("after"),
                F.when(is_del, F.lit("d"))
                .when(is_upd, F.lit("u"))
                .otherwise(F.lit("c"))
                .alias("op"),
                F.col("ts_us").alias("ts_ms"),
                _src("dims").alias("source"),
            )
        ).alias("value"),
        F.lit("log.0").alias("file"),
        F.col("ts_us").alias("pos"),
        "day",
    )
    fact_env = base.filter(F.col("event_id") % 2 == 1).select(
        F.to_json(
            F.struct(
                F.struct("event_id", "user_id", "value").alias("after"),
                F.lit("c").alias("op"),
                F.col("ts_us").alias("ts_ms"),
                _src("facts").alias("source"),
            )
        ).alias("value"),
        F.lit("log.0").alias("file"),
        F.col("ts_us").alias("pos"),
        "day",
    )
    raw = dim_env.unionByName(fact_env)

    join = ChangelogJoin(
        left,
        right,
        replay_state_dir("cj_replay", sf_dir),
        how="inner",
        n_buckets=8,
    )
    for epoch, (lo, hi) in enumerate(((1, 10), (11, 20), (21, 31))):
        join.process_batch(
            raw.filter(F.col("day").between(lo, hi)).select(
                "value", "file", "pos"
            ),
            epoch_id=epoch,
        )
    view = join.read_view(spark)
    return view.select(
        "event_id", "user_id", "value", "r_score", "r_ver"
    ).orderBy("event_id")


CHANGELOG_JOIN_REPLAY_SQL = """
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events
),
dim_log AS (
  SELECT user_id, value AS score, event_id AS ver, ts_us,
         CASE WHEN event_id % 10 = 0 THEN 'd' ELSE 'c' END AS op
  FROM ev WHERE event_id % 2 = 0
),
dim_latest AS (
  SELECT user_id, score, ver FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts_us DESC) AS rk
    FROM dim_log
  ) WHERE rk = 1 AND op <> 'd'
)
SELECT f.event_id, f.user_id, f.value,
       d.score AS r_score, d.ver AS r_ver
FROM (SELECT event_id, user_id, value FROM ev WHERE event_id % 2 = 1) f
JOIN dim_latest d ON d.user_id = f.user_id
ORDER BY f.event_id
"""


REPLAY_QUERIES = {
    "changelog_join_replay": (
        changelog_join_replay_query,
        CHANGELOG_JOIN_REPLAY_SQL,
    ),
}
