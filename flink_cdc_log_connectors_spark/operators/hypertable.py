"""Hypertable-style time-bucket rollups over the event stream.

TimescaleDB-flavored operators the reference's CDC users build downstream
of a changelog (time-partitioned fact tables + continuous aggregates),
expressed Spark-first:

- ``time_bucket(width_seconds, ts)`` — arbitrary fixed-width buckets as
  pure TIMESTAMP_NTZ arithmetic (session-timezone independent, codegen'd).
- **Two-level continuous aggregate** — raw events → fine (15 min) rollup →
  coarse (1 h) rollup REAGGREGATED FROM THE FINE LEVEL.  Sum/count/min/max
  compose exactly, so the coarse level never rescans raw data; at 100 TB
  this is the difference between scanning a day of raw events and scanning
  96 pre-aggregated rows per key.  The DuckDB oracle computes the hourly
  aggregate directly from raw rows — equality proves the reaggregation
  identity, not just the plumbing.
- ``bucket_gapfill`` — dense bucket axis per key (sequence + explode) with
  zero-filled empty buckets; the scale path generates the axis from each
  key's own [min, max] span (no driver-side loop, no global materialized
  calendar).

Plan shape: one shuffle per rollup level keyed by (bucket, key) with
map-side partial aggregation; gap-fill adds one broadcast-able join of the
dense axis against the fine rollup (both already bucket-grained, i.e.
orders of magnitude smaller than raw).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def time_bucket(width_seconds: int, ts_col: str) -> Column:
    """Floor a TIMESTAMP_NTZ column to a fixed-width bucket (epoch-aligned).

    FLOOR-aligned on whole seconds via ``pmod`` (bucket start =
    s - pmod(s, w)) — exact integer arithmetic, no session-timezone
    dependence, whole-stage-codegen'd.  ``div`` would truncate toward
    zero and mis-bucket pre-epoch timestamps (upper-aligned buckets);
    pmod floors for negative s exactly like DuckDB's ``//`` used in the
    oracles.
    """
    s = f"timestampdiff(SECOND, {_EPOCH}, {ts_col})"
    return F.expr(
        f"timestampadd(SECOND, {s} - pmod({s}, {width_seconds}), {_EPOCH})"
    )


def _bucket_sql(width_seconds: int, ts: str) -> str:
    """DuckDB twin of :func:`time_bucket` (same epoch-aligned arithmetic —
    DuckDB's own ``time_bucket`` aligns to 2000-01-01, which agrees only
    for widths dividing a day; this form agrees for every width)."""
    return (
        f"make_timestamp((epoch(date_trunc('second', {ts}))::BIGINT "
        f"// {width_seconds}) * {width_seconds} * 1000000)"
    )


FINE_S = 900  # 15 minutes
COARSE_S = 3600  # 1 hour


def rollup_fine(events: DataFrame, width_seconds: int = FINE_S) -> DataFrame:
    """Level-1 continuous aggregate: per (bucket, event_type) sums/counts/
    extrema in exact decimals (reaggregation-safe)."""
    return (
        events.withColumn("bucket", time_bucket(width_seconds, "ts"))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v_sum"),
            F.min(F.col("value").cast("decimal(18,2)")).alias("v_min"),
            F.max(F.col("value").cast("decimal(18,2)")).alias("v_max"),
        )
    )


def reaggregate(
    fine: DataFrame, width_seconds: int = COARSE_S
) -> DataFrame:
    """Roll a fine-grained aggregate up to a coarser bucket WITHOUT touching
    raw data: counts and sums add, extrema take min/max — the continuous-
    aggregate composition law."""
    return (
        fine.withColumn("cbucket", time_bucket(width_seconds, "bucket"))
        .groupBy("cbucket", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_sum").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def hypertable_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly aggregate computed by reaggregating the 15-minute level.
    The oracle computes the hour directly from raw events — the hash match
    proves two-level rollup composition is exact."""
    events = load_table(spark, sf_dir, "events")
    hourly = reaggregate(rollup_fine(events))
    return hourly.select(
        F.col("cbucket").alias("h"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("v_sum").cast("double").alias("v_sum"),
        F.col("v_min").cast("double").alias("v_min"),
        F.col("v_max").cast("double").alias("v_max"),
    ).orderBy("h", "event_type")


HYPERTABLE_ROLLUP_SQL = f"""
SELECT {_bucket_sql(COARSE_S, "ts")} AS h, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_min,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_max
FROM events GROUP BY 1, 2 ORDER BY h, event_type
"""


def bucket_gapfill(
    fine: DataFrame, width_seconds: int = FINE_S, key_col: str = "event_type"
) -> DataFrame:
    """Dense per-key bucket axis with zero-filled gaps.

    The axis is generated per key from its own [min, max] bucket span with
    ``sequence`` + ``explode`` — distributed, no driver loop, no global
    calendar table; the join back to the sparse rollup is bucket-grained
    (broadcast-able in the common case of few keys × bounded span).
    """
    spans = fine.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    axis = spans.select(
        key_col,
        F.explode(
            F.sequence(
                "lo", "hi", F.expr(f"INTERVAL {width_seconds} SECOND")
            )
        ).alias("bucket"),
    )
    return (
        axis.join(fine, ["bucket", key_col], "left")
        .select(
            "bucket",
            key_col,
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("v_sum"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum"),
        )
    )


def gapfill_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return bucket_gapfill(rollup_fine(events)).orderBy("bucket", "event_type")


GAPFILL_SQL = f"""
WITH fine AS (
  SELECT {_bucket_sql(FINE_S, "ts")} AS bucket, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS v_sum
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM fine
  GROUP BY event_type
),
axis AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL {FINE_S} SECOND)) AS bucket
  FROM spans
)
SELECT a.bucket, a.event_type,
       COALESCE(f.n, 0) AS n,
       CAST(COALESCE(f.v_sum, 0) AS DOUBLE) AS v_sum
FROM axis a LEFT JOIN fine f
  ON a.bucket = f.bucket AND a.event_type = f.event_type
ORDER BY a.bucket, a.event_type
"""


# --------------------------------------------------------------------------
# first()/last() per bucket + counter delta (TimescaleDB-parity surface)
# --------------------------------------------------------------------------


def bucket_first_last(
    events: DataFrame,
    width_seconds: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """TimescaleDB ``first(value, ts)`` / ``last(value, ts)`` per
    (bucket, key) — the opening/closing observation of each window
    (candlestick open/close).  ``min_by``/``max_by`` tie behavior is
    engine-undefined, so ranking runs over the explicit total order
    (ts, tie_col): deterministic in both engines.  One window shuffle on
    (bucket, key); at scale this is the same partitioning the rollup
    aggregation already uses."""
    from pyspark.sql.window import Window

    b = time_bucket(width_seconds, ts_col)
    w = Window.partitionBy("bucket", key_col)
    asc = w.orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    desc = w.orderBy(F.col(ts_col).desc(), F.col(tie_col).desc())
    return (
        events.withColumn("bucket", b)
        .withColumn("__rn_a", F.row_number().over(asc))
        .withColumn("__rn_d", F.row_number().over(desc))
        .groupBy("bucket", key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(
                F.when(F.col("__rn_a") == 1, F.col(value_col))
            ).alias("first_value"),
            F.max(
                F.when(F.col("__rn_d") == 1, F.col(value_col))
            ).alias("last_value"),
        )
    )


def first_last_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        bucket_first_last(events, COARSE_S)
        .orderBy("bucket", "event_type")
        .limit(2000)
    )


FIRST_LAST_SQL = f"""
WITH b AS (
  SELECT {_bucket_sql(COARSE_S, "ts")} AS bucket, event_type, value,
         row_number() OVER (PARTITION BY {_bucket_sql(COARSE_S, "ts")},
                            event_type ORDER BY ts ASC, event_id ASC)
           AS rn_a,
         row_number() OVER (PARTITION BY {_bucket_sql(COARSE_S, "ts")},
                            event_type ORDER BY ts DESC, event_id DESC)
           AS rn_d
  FROM events
)
SELECT bucket, event_type, CAST(count(*) AS BIGINT) AS n,
       max(CASE WHEN rn_a = 1 THEN value END) AS first_value,
       max(CASE WHEN rn_d = 1 THEN value END) AS last_value
FROM b GROUP BY bucket, event_type ORDER BY bucket, event_type LIMIT 2000
"""


def bucket_delta(
    agg: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-key delta of consecutive bucket sums (counter-rate shape: the
    change of a cumulative metric between adjacent windows).  Exact
    DECIMAL subtraction over the rollup output — no raw-data rescan, one
    skinny window per key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy("bucket")
    return agg.select(
        "bucket",
        key_col,
        "v_sum",
        (F.col("v_sum") - F.lag("v_sum").over(w)).alias("delta"),
    )


def delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fine = rollup_fine(events, COARSE_S)
    return (
        bucket_delta(fine)
        .select(
            "bucket", "event_type",
            F.col("v_sum").cast("double").alias("v_sum"),
            F.col("delta").cast("double").alias("delta"),
        )
        .orderBy("bucket", "event_type")
        .limit(2000)
    )


DELTA_SQL = f"""
WITH fine AS (
  SELECT {_bucket_sql(COARSE_S, "ts")} AS bucket, event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS v_sum
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type, CAST(v_sum AS DOUBLE) AS v_sum,
       CAST(v_sum - LAG(v_sum) OVER (PARTITION BY event_type
                                     ORDER BY bucket) AS DOUBLE) AS delta
FROM fine ORDER BY bucket, event_type LIMIT 2000
"""


# --------------------------------------------------------------------------
# Largest-triangle downsampling (parallel LTTB variant)
# --------------------------------------------------------------------------


def largest_triangle_downsample(
    events: DataFrame,
    width_seconds: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """One representative point per (key, bucket): the point forming the
    largest triangle with the NEIGHBOR BUCKETS' average points — the
    bucket-parallel variant of LTTB (classic LTTB anchors on the
    previously SELECTED point, a sequential dependency; anchoring on
    fixed bucket averages is the formulation that parallelizes, per the
    original downsampling thesis's largest-triangle-one-bucket family).
    A series' first bucket keeps its earliest point and its last bucket
    its latest (LTTB's endpoint rule).

    Cross-engine determinism with NO rounding discipline: bucket
    averages are exact-decimal sums (values) and exact integer sums
    (epoch seconds) divided as doubles — both engines derive
    bit-identical anchors — and the triangle area is a fixed-order
    double expression of them; ties break on ``tie_col``.

    Plan: one (key, bucket) aggregation for anchors, lag/lead over the
    TINY per-bucket rows, join back to the points (AQE broadcasts when
    small), one
    rank window per (key, bucket) — at 100 TB the points shuffle once.
    """
    from pyspark.sql.window import Window

    from ..functions.datetime import epoch_seconds

    e = events.withColumn("bucket", time_bucket(width_seconds, ts_col))
    te = epoch_seconds(ts_col).cast("long")
    agg = (
        e.groupBy(key_col, "bucket")
        .agg(
            (
                F.sum(te).cast("double") / F.count(F.lit(1))
            ).alias("t_avg"),
            (
                F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v_avg"),
        )
    )
    wk = Window.partitionBy(key_col).orderBy("bucket")
    anchors = (
        agg.withColumn("tp", F.lag("t_avg").over(wk))
        .withColumn("vp", F.lag("v_avg").over(wk))
        .withColumn("tn", F.lead("t_avg").over(wk))
        .withColumn("vn", F.lead("v_avg").over(wk))
        .select(key_col, "bucket", "tp", "vp", "tn", "vn")
    )
    # no broadcast hint: anchor cardinality is O(keys × buckets), which a
    # long-retention corpus can push past broadcast limits — AQE
    # broadcasts when the per-bucket table is actually small
    pts = e.join(anchors, [key_col, "bucket"])
    tc = te.cast("double")
    vc = F.col(value_col)
    area = F.abs(
        (F.col("tp") - F.col("tn")) * (vc - F.col("vp"))
        - (F.col("tp") - tc) * (F.col("vn") - F.col("vp"))
    )
    # endpoint buckets (no prev/next anchor): earliest / latest point
    first_b = F.col("tp").isNull()
    order_key = (
        F.when(first_b, -te)  # first bucket: earliest point ranks first
        .when(F.col("tn").isNull(), te)  # last bucket: latest point
        .otherwise(area)
    )
    w = Window.partitionBy(key_col, "bucket").orderBy(
        F.col("__ok").desc(), F.col(tie_col).asc()
    )
    return (
        pts.withColumn("__ok", order_key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, "bucket", ts_col, tie_col, value_col)
    )


def downsample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        largest_triangle_downsample(events, COARSE_S)
        .select(
            "event_type", "bucket", "ts", "event_id",
            F.col("value").alias("v"),
        )
        .orderBy("event_type", "bucket")
        .limit(2000)
    )


def _downsample_sql() -> str:
    b = _bucket_sql(COARSE_S, "ts")
    return f"""
WITH e AS (
  SELECT event_type, {b} AS bucket, ts, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS te
  FROM events
),
agg AS (
  SELECT event_type, bucket,
         CAST(SUM(te) AS DOUBLE) / COUNT(*) AS t_avg,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           AS v_avg
  FROM e GROUP BY event_type, bucket
),
anchors AS (
  SELECT event_type, bucket,
         LAG(t_avg) OVER w AS tp, LAG(v_avg) OVER w AS vp,
         LEAD(t_avg) OVER w AS tn, LEAD(v_avg) OVER w AS vn
  FROM agg WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
ranked AS (
  SELECT e.event_type, e.bucket, e.ts, e.event_id, e.value,
         row_number() OVER (
           PARTITION BY e.event_type, e.bucket
           ORDER BY (CASE WHEN a.tp IS NULL THEN -e.te
                          WHEN a.tn IS NULL THEN e.te
                          ELSE abs((a.tp - a.tn) * (e.value - a.vp)
                                   - (a.tp - CAST(e.te AS DOUBLE))
                                     * (a.vn - a.vp)) END) DESC,
                    e.event_id ASC) AS rn
  FROM e JOIN anchors a
    ON e.event_type = a.event_type AND e.bucket = a.bucket
)
SELECT event_type, bucket, ts, event_id, value AS v
FROM ranked WHERE rn = 1
ORDER BY event_type, bucket LIMIT 2000
"""


# --------------------------------------------------------------------------
# locf + linear interpolation over the gapfilled axis (TimescaleDB
# time_bucket_gapfill(locf(...)) / interpolate(...) parity)
# --------------------------------------------------------------------------


def bucket_fill_values(
    fine: DataFrame, width_seconds: int = FINE_S, key_col: str = "event_type"
) -> DataFrame:
    """Dense per-key axis with BOTH TimescaleDB gap-fill value policies:

    - ``v_locf`` — last-observation-carried-forward (``locf()``),
    - ``v_interp`` — linear interpolation between the neighboring observed
      buckets (``interpolate()``); NULL before the first / after the last
      observation, exactly as TimescaleDB leaves the edges.

    One dense-axis join (same as :func:`bucket_gapfill`) plus one window
    per key over the BUCKET-GRAINED rows — at 100 TB the window input is
    the rollup, orders of magnitude smaller than raw events.  Every value
    derives from exact decimal sums and integer epoch seconds, and the
    interpolation expression is a fixed-order double formula, so the
    DuckDB oracle is bit-exact.
    """
    from pyspark.sql.window import Window

    spans = fine.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    axis = spans.select(
        key_col,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {width_seconds} SECOND"))
        ).alias("bucket"),
    )
    sparse = axis.join(fine, ["bucket", key_col], "left").select(
        "bucket",
        key_col,
        F.col("v_sum").cast("double").alias("v"),
    )
    from ..functions.datetime import epoch_seconds

    t = epoch_seconds("bucket").cast("long")
    wp = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("v")
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.col("__pv")
        + (F.col("__nv") - F.col("__pv"))
        * (
            (t.cast("double") - F.col("__pt").cast("double"))
            / (F.col("__nt").cast("double") - F.col("__pt").cast("double"))
        )
    )
    return (
        sparse.withColumn("__pv", prev_v)
        .withColumn("__pt", prev_t)
        .withColumn("__nv", next_v)
        .withColumn("__nt", next_t)
        .select(
            "bucket",
            key_col,
            "v",
            F.col("__pv").alias("v_locf"),
            interp.alias("v_interp"),
        )
    )


def fill_values_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no LIMIT → no ORDER BY: the correctness compare hashes rows
    # order-insensitively, and the global sort would cost more than the
    # fill itself (measured 2.8 s → 1.4 s at sf0.1)
    events = load_table(spark, sf_dir, "events")
    return bucket_fill_values(rollup_fine(events))


FILL_VALUES_SQL = f"""
WITH fine AS (
  SELECT {_bucket_sql(FINE_S, "ts")} AS bucket, event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS v_sum
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM fine
  GROUP BY event_type
),
axis AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL {FINE_S} SECOND)) AS bucket
  FROM spans
),
sparse AS (
  SELECT a.bucket, a.event_type, CAST(f.v_sum AS DOUBLE) AS v,
         CAST(epoch(a.bucket) AS BIGINT) AS t
  FROM axis a LEFT JOIN fine f
    ON a.bucket = f.bucket AND a.event_type = f.event_type
),
filled AS (
  SELECT bucket, event_type, v, t,
         LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER wp AS pt,
         FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER wn AS nt
  FROM sparse
  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT bucket, event_type, v, pv AS v_locf,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * ((CAST(t AS DOUBLE) - CAST(pt AS DOUBLE))
                                   / (CAST(nt AS DOUBLE) - CAST(pt AS DOUBLE)))
       END AS v_interp
FROM filled ORDER BY bucket, event_type
"""


# --------------------------------------------------------------------------
# Per-bucket value histograms (distribution-shape rollup)
# --------------------------------------------------------------------------

HIST_BIN_W = 50.0
HIST_BINS = 10


def bucket_histogram(
    events: DataFrame,
    width_seconds: int = COARSE_S,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-bin value histogram per (time bucket, key) — the
    distribution-shape companion of the sum/min/max rollup (latency
    heatmaps, SLO burn charts).  Bin = ``min(floor(v / w), bins-1)`` in
    plain IEEE arithmetic — deterministic across engines, no
    width_bucket edge-semantics dependence.  Same single (bucket, key)
    aggregation shuffle as every rollup; output cardinality is
    buckets × keys × bins."""
    b = time_bucket(width_seconds, "ts")
    bin_c = F.least(
        F.floor(F.col(value_col) / F.lit(HIST_BIN_W)).cast("int"),
        F.lit(HIST_BINS - 1),
    )
    return (
        events.withColumn("bucket", b)
        .withColumn("bin", bin_c)
        .groupBy("bucket", key_col, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        bucket_histogram(events)
        .orderBy("bucket", "event_type", "bin")
        .limit(4000)
    )


HISTOGRAM_SQL = f"""
SELECT {_bucket_sql(COARSE_S, "ts")} AS bucket, event_type,
       CAST(least(floor(value / {HIST_BIN_W}), {HIST_BINS - 1}) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2, 3
ORDER BY bucket, event_type, bin LIMIT 4000
"""


# --------------------------------------------------------------------------
# TimescaleDB toolkit parity: time_weight / counter_agg / state_agg
# --------------------------------------------------------------------------

DAY_S = 86400


def time_weighted_average(
    events: DataFrame,
    width_seconds: int = DAY_S,
    key_col: str = "event_type",
) -> DataFrame:
    """LOCF time-weighted average per (key, bucket) with EXACT segment
    clipping (TimescaleDB ``time_weight('LOCF', ...)`` semantics).

    Each observation holds its value until the key's next observation
    (total order: ``ts, event_id`` — microsecond ties stay deterministic);
    the held segment ``[ts, next_ts)`` is split across every bucket it
    overlaps and clipped to the bucket boundaries, so a value that spans
    midnight is weighted into both days by its actual microseconds in
    each — not attributed wholesale to the segment's start bucket.

    Scale shape: one window per key for the lead, then ``sequence`` +
    ``explode`` fans each segment out only to the buckets it touches
    (for gap-free streams this is ~1 row in, ~1 row out), and one keyed
    aggregate.  No driver-side state, no global sort; weights are exact
    integer microseconds and values exact decimals, so the final average
    is ONE IEEE double division — reproducible across engines.
    """
    w = Window.partitionBy(key_col).orderBy("ts", "event_id")
    seg = (
        events.select(key_col, "ts", "value", "event_id")
        .withColumn("t2", F.lead("ts").over(w))
        .filter(F.col("t2") > F.col("ts"))
    )
    width_us = width_seconds * 1_000_000
    seg = seg.select(
        key_col,
        "ts",
        "t2",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.explode(
            F.sequence(
                time_bucket(width_seconds, "ts"),
                # last bucket the half-open segment touches: bucket(t2 - 1µs)
                time_bucket(
                    width_seconds, "timestampadd(MICROSECOND, -1, t2)"
                ),
                F.expr(f"INTERVAL {width_seconds} SECOND"),
            )
        ).alias("bucket"),
    )
    clipped = seg.select(
        key_col,
        "bucket",
        "v",
        F.expr(
            "timestampdiff(MICROSECOND, greatest(ts, bucket), "
            f"least(t2, timestampadd(SECOND, {width_seconds}, bucket)))"
        )
        .cast("decimal(18,0)")
        .alias("dur_us"),
    )
    agg = clipped.groupBy("bucket", key_col).agg(
        F.sum(F.col("v") * F.col("dur_us")).alias("wsum"),
        F.sum("dur_us").cast("long").alias("weight_us"),
    )
    return agg.select(
        "bucket",
        key_col,
        (
            F.col("wsum").cast("double") / F.col("weight_us").cast("double")
        ).alias("twa"),
        "weight_us",
    )


def time_weight_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return time_weighted_average(events).orderBy("bucket", "event_type")


TIME_WEIGHT_SQL = f"""
WITH seg AS (
  SELECT event_type, ts, value,
         LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS t2
  FROM events
),
clipped AS (
  SELECT event_type,
         unnest(generate_series(
           {_bucket_sql(DAY_S, "ts")},
           {_bucket_sql(DAY_S, "t2 - INTERVAL 1 MICROSECOND")},
           INTERVAL {DAY_S} SECOND)) AS bucket,
         CAST(value AS DECIMAL(18,2)) AS v,
         ts, t2
  FROM seg WHERE t2 > ts
)
SELECT bucket, event_type,
       CAST(SUM(v * CAST(date_diff('microsecond',
                greatest(ts, bucket),
                least(t2, bucket + INTERVAL {DAY_S} SECOND)) AS DECIMAL(18,0)))
            AS DOUBLE)
       / CAST(CAST(SUM(CAST(date_diff('microsecond',
                greatest(ts, bucket),
                least(t2, bucket + INTERVAL {DAY_S} SECOND)) AS DECIMAL(18,0)))
              AS BIGINT) AS DOUBLE) AS twa,
       CAST(SUM(CAST(date_diff('microsecond',
                greatest(ts, bucket),
                least(t2, bucket + INTERVAL {DAY_S} SECOND)) AS DECIMAL(18,0)))
            AS BIGINT) AS weight_us
FROM clipped
GROUP BY bucket, event_type
ORDER BY bucket, event_type
"""


def counter_delta(
    events: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """TimescaleDB ``counter_agg`` semantics over ``value`` read as a
    resetting counter: the per-key total increase counts ``v - prev``
    for monotone steps and ``v`` after a reset (counter restarted from
    zero), plus the reset count.  Distinct from :func:`bucket_delta`,
    which differences BUCKET SUMS and has no reset model.

    One window per key for the lag, one hash aggregate — both keyed, no
    global state.  Exact decimal arithmetic end to end; doubles appear
    only in the final cast."""
    w = Window.partitionBy(key_col).orderBy("ts", "event_id")
    v = F.col("value").cast("decimal(18,2)")
    stepped = events.select(
        key_col,
        v.alias("v"),
        F.lag(v).over(w).alias("prev"),
    )
    increase = F.when(F.col("prev").isNull(), F.lit(0).cast("decimal(18,2)")).otherwise(
        F.when(F.col("v") >= F.col("prev"), F.col("v") - F.col("prev")).otherwise(
            F.col("v")
        )
    )
    is_reset = (F.col("prev").isNotNull() & (F.col("v") < F.col("prev"))).cast(
        "long"
    )
    return (
        stepped.groupBy(key_col)
        .agg(
            F.sum(increase).cast("double").alias("total_increase"),
            F.sum(is_reset).alias("num_resets"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


def counter_delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return counter_delta(events).orderBy("event_type")


COUNTER_DELTA_SQL = """
WITH stepped AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         LAG(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN prev IS NULL THEN CAST(0 AS DECIMAL(18,2))
                     WHEN v >= prev THEN v - prev
                     ELSE v END) AS DOUBLE) AS total_increase,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND v < prev THEN 1 ELSE 0 END)
            AS BIGINT) AS num_resets,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM stepped
GROUP BY event_type
ORDER BY event_type
"""


def state_durations(events: DataFrame) -> DataFrame:
    """TimescaleDB ``state_agg`` shape: per user, time spent in each
    state, where the state is the last event's type until the next event
    (microsecond-exact; the user's final event has no successor and
    contributes no duration — the open interval's end is unknown).

    One window per user for the lead, one (user, state) aggregate — the
    window partitioning is the natural even key (users), so no skew
    hot-spot; durations are exact integer microseconds."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("t2", F.lead("ts").over(w))
        .filter(F.col("t2").isNotNull())
        .groupBy("user_id", F.col("event_type").alias("state"))
        .agg(
            F.sum(F.expr("timestampdiff(MICROSECOND, ts, t2)")).alias(
                "state_us"
            ),
            F.count(F.lit(1)).alias("n_entries"),
        )
    )


def state_durations_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return state_durations(events).orderBy("user_id", "state")


STATE_DURATIONS_SQL = """
WITH seg AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
  FROM events
)
SELECT user_id, event_type AS state,
       CAST(SUM(date_diff('microsecond', ts, t2)) AS BIGINT) AS state_us,
       CAST(COUNT(*) AS BIGINT) AS n_entries
FROM seg WHERE t2 IS NOT NULL
GROUP BY user_id, event_type
ORDER BY user_id, state
"""


HYPERTABLE_QUERIES = {
    "hypertable_rollup": (hypertable_rollup_query, HYPERTABLE_ROLLUP_SQL),
    "hypertable_gapfill": (gapfill_query, GAPFILL_SQL),
    "hypertable_first_last": (first_last_query, FIRST_LAST_SQL),
    "hypertable_delta": (delta_query, DELTA_SQL),
    "hypertable_downsample": (downsample_query, _downsample_sql()),
    "hypertable_fill_values": (fill_values_query, FILL_VALUES_SQL),
    "hypertable_histogram": (histogram_query, HISTOGRAM_SQL),
    "hypertable_time_weight": (time_weight_query, TIME_WEIGHT_SQL),
    "hypertable_counter_delta": (counter_delta_query, COUNTER_DELTA_SQL),
    "hypertable_state_durations": (state_durations_query, STATE_DURATIONS_SQL),
}
