"""Frequent-item sketches: Misra–Gries summaries + exact heavy hitters.

Two tiers, matching how a 100 TB engine actually answers "what are the hot
keys":

- **Exact heavy hitters** (``heavy_hitters``): one hash aggregation with
  map-side combine, then a relative-support filter.  On Spark this is
  almost always the right call — the shuffle carries one row per DISTINCT
  key (not per event), and the threshold test is a tiny post-agg filter.
  Registry entry with a full SQL oracle.

- **Misra–Gries summaries** (``misra_gries_topk``): bounded-memory
  (O(k) per partition) frequent-item sketch for when even the distinct
  keys don't fit a shuffle — streaming ingest, per-batch monitoring
  gauges, pre-aggregation guards against pathological key explosions.
  Partial summaries are computed per partition in one Arrow pass and
  merged with the standard mergeable-summaries rule (sum counters, then
  subtract the (k+1)-th largest merged weight), preserving the MG
  guarantee: every item with true frequency > n/(k+1) survives, and each
  estimate undercounts by at most n/(k+1).  The output depends on
  partition layout (any MG does), so it is test-verified against its
  error bound rather than oracle-hashed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..io import load_table


def heavy_hitters(
    df: DataFrame, key_col: str, min_share: float
) -> DataFrame:
    """Exact keys appearing in at least ``min_share`` of all rows.  One
    aggregation (partial combine first); the grand total is a 1-row
    re-aggregation of the counts broadcast back onto them — an
    unpartitioned window here would funnel every distinct key through ONE
    reducer, the classic global-window scale trap."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("__total") * F.lit(min_share))
        .select(
            key_col,
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") / F.col("__total")).alias("share"),
        )
    )


_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("weight", T.LongType()),
    ]
)


def misra_gries_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries (≤ k counters each) in one
    Arrow-batched pass.  Counter state lives across a partition's batches;
    memory is O(k) regardless of partition size."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[key_col].astype(str):
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all: drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, _SUMMARY_SCHEMA
    )


def misra_gries_topk(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Merged Misra–Gries sketch: per-partition summaries → one summed
    summary (≤ partitions × k rows — trivially small) → subtract the
    (k+1)-th largest merged weight (mergeable-summaries rule), keep
    positive estimates.  ``est`` lower-bounds the true count; the true
    count exceeds ``est`` by at most n/(k+1)."""
    merged = (
        misra_gries_summaries(df, key_col, k)
        .groupBy("item")
        .agg(F.sum("weight").alias("w"))
    )
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.col("w").desc(), F.col("item"))
    )
    ranked = merged.withColumn("__rn", rn)
    thr = F.max(F.when(F.col("__rn") == k + 1, F.col("w"))).over(
        Window.partitionBy()
    )
    return (
        ranked.withColumn("__thr", F.coalesce(thr, F.lit(0)))
        .withColumn("est", F.col("w") - F.col("__thr"))
        .filter(F.col("est") > 0)
        .select("item", F.col("est").cast("long").alias("est"))
    )


# --------------------------------------------------------------------------
# registry query (exact tier)
# --------------------------------------------------------------------------


def heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users generating ≥ 0.05% of all events — the hot-key report that
    precedes any skew mitigation (salting thresholds, broadcast decisions)."""
    events = load_table(spark, sf_dir, "events")
    return (
        heavy_hitters(events, "user_id", 0.0005)
        .select(
            "user_id",
            "cnt",
            F.round(F.col("share"), 8).alias("share_r"),
        )
        .orderBy("user_id")
        .limit(2000)
    )


HEAVY_HITTERS_SQL = """
WITH counts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
tot AS (SELECT SUM(cnt) AS total FROM counts)
SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 8) AS share_r
FROM counts, tot
WHERE cnt >= total * 0.0005
ORDER BY user_id LIMIT 2000
"""


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, oracle-checkable
# --------------------------------------------------------------------------

KMV_K = 64


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via the k minimum md5
    hash values — the mergeable distinct sketch whose estimate
    ``(k-1) / kth_min_normalized`` is DETERMINISTIC (md5 order has no
    RNG, no engine-specific HLL register layout), so unlike HLL the
    whole sketch carries a full cross-engine value oracle.  Groups with
    fewer than k distinct values report exactly.

    Plan: distinct (group, value) → one ranking window per group keyed
    by the hash (k rows survive per group) → one tiny aggregation.  The
    sketches merge by keeping the k smallest of a union — the same
    property HLL offers, with the estimate checkable to the last bit.
    """
    h = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        )
        .cast("long")
    )
    distinct = df.select(group_col, value_col).distinct().withColumn("__h", h)
    w = Window.partitionBy(group_col).orderBy("__h")
    kept = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("__h").alias("__kth"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.col("__kth").cast("double") / F.lit(float(1 << 60)))
    )
    return agg.select(
        group_col, "n_kept", F.round(est, 4).alias("est_distinct")
    )


def kmv_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type, value-checked (the
    deterministic counterpart of q04b's rows-only HLL)."""
    events = load_table(spark, sf_dir, "events")
    return (
        kmv_distinct(events, "event_type", "user_id")
        .orderBy("event_type")
    )


KMV_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
h AS (
  SELECT event_type,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM d
),
kept AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept, max(hv) AS kth
  FROM kept WHERE rn <= {KMV_K} GROUP BY event_type
)
SELECT event_type, n_kept,
       ROUND(CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
                  ELSE CAST({KMV_K - 1} AS DOUBLE)
                       / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
             END, 4) AS est_distinct
FROM agg ORDER BY event_type
"""




# --------------------------------------------------------------------------
# Histogram quantile estimation (the 100 TB quantile path)
# --------------------------------------------------------------------------

HIST_BINS = 256
HIST_QS = (0.5, 0.9, 0.99)


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    val_col: str,
    qs: tuple[float, ...] = HIST_QS,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a fixed-bin histogram — the
    mergeable, bounded-state formulation that replaces an exact global
    sort at scale (q20 is the exact twin; error is ≤ one bin width,
    (hi-lo)/bins).  Estimate = the upper edge of the first bin whose
    cumulative count reaches ceil(q·n).

    Two aggregations, both map-side combined: (1) per-group min/max/count
    (one row per group, broadcast back), (2) per-(group, bin) counts —
    the shuffle carries ≤ groups×bins rows regardless of corpus size.
    The quantile selection runs on the histogram only (a window over
    ≤bins rows per group plus a |qs|-row broadcast).  Bin index and
    edges use the identical double expression order in both engines, so
    the estimates are value-exact across engines.  A degenerate group
    (hi == lo, zero-width bins) short-circuits to bin 0 / estimate lo on
    both sides rather than dividing by zero.  NULL values are excluded
    up front (quantiles are over the non-null population; counting NULLs
    in n while binning them nowhere would skew every rank)."""
    spark = df.sparkSession
    src = df.select(group_col, val_col).filter(F.col(val_col).isNotNull())
    stats = src.groupBy(group_col).agg(
        F.min(val_col).alias("lo"),
        F.max(val_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    binned = src.join(F.broadcast(stats), group_col).select(
        group_col,
        "n",
        "lo",
        "hi",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((F.col(val_col) - F.col("lo")) / width).cast("int"),
            )
        )
        .alias("b"),
    )
    hist = binned.groupBy(group_col, "n", "lo", "hi", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    hit = cum.join(F.broadcast(qdf)).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    picked = hit.groupBy(group_col, "q", "lo", "hi", "n").agg(
        F.min("b").alias("b")
    )
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo")
        + (F.col("b") + 1) * ((F.col("hi") - F.col("lo")) / F.lit(float(bins)))
    )
    return picked.select(
        group_col,
        "q",
        F.round(est, 6).alias("est"),
        F.col("n").cast("long").alias("n"),
    ).orderBy(group_col, "q")


def histogram_quantiles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles(li, "l_returnflag", "l_extendedprice")


HIST_QUANTILES_SQL = f"""
WITH stats AS (
  SELECT l_returnflag, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         count(*) AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY l_returnflag
),
binned AS (
  SELECT li.l_returnflag, n, lo, hi,
         CASE WHEN hi = lo THEN 0
              ELSE least({HIST_BINS - 1}, CAST(floor((l_extendedprice - lo)
                   / ((hi - lo) / {float(HIST_BINS)})) AS INT)) END AS b
  FROM lineitem li JOIN stats USING (l_returnflag)
  WHERE l_extendedprice IS NOT NULL
),
hist AS (
  SELECT l_returnflag, n, lo, hi, b, count(*) AS cnt
  FROM binned GROUP BY l_returnflag, n, lo, hi, b
),
cum AS (
  SELECT *, sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY b
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum
  FROM hist
),
hit AS (
  SELECT l_returnflag, q, lo, hi, n, min(b) AS b
  FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q) qs
  WHERE cum >= ceil(q * n)
  GROUP BY l_returnflag, q, lo, hi, n
)
SELECT l_returnflag, q,
       round(CASE WHEN hi = lo THEN lo
                  ELSE lo + (b + 1) * ((hi - lo) / {float(HIST_BINS)}) END,
             6) AS est,
       CAST(n AS BIGINT) AS n
FROM hit ORDER BY l_returnflag, q
"""


# --------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimation under bounded state)
# --------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH_BITS = 10           #: 2^10 = 1024 counters per row
_CMS_MASK = (1 << CMS_WIDTH_BITS) - 1


def _cms_buckets_col(h):
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.shiftrightunsigned(h, CMS_WIDTH_BITS * r)
                .bitwiseAND(F.lit(_CMS_MASK))
                .alias("bucket"),
            )
            for r in range(CMS_DEPTH)
        ]
    )


def count_min_sketch_tokens(
    docs: DataFrame, topk: int = 20, text_col: str = "text"
) -> DataFrame:
    """Count-Min sketch over the corpus token stream, audited against
    exact counts for the top-k tokens.

    The sketch is DEPTH×WIDTH (3×1024) counters; each row's bucket is a
    disjoint 10-bit field of the token's portable md5-60 (one hash
    computed, three derived row functions — deterministic, which is what
    makes the sketch value-oracle-checkable; independent salted hashes
    would sharpen the union bound at deployment, at the cost of 3 md5
    passes).  CMS guarantees ``estimate ≥ exact`` always, with
    overcounts bounded by colliding mass / width per row.

    Scale shape: the corpus collapses to the distinct vocabulary first
    (one shuffle with map-side combine — the same discipline as every
    text operator here), the 3072-cell table is built from the vocab,
    and the top-k probe joins the broadcast cell table.  State is O(1)
    regardless of corpus size — the point of a CMS."""
    from ..functions.text import tokens

    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    hashed = vocab.withColumn("__h", h)
    cells = (
        hashed.select(F.explode(_cms_buckets_col(F.col("__h"))).alias("b"), "cnt")
        .groupBy("b.r", "b.bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    top = hashed.orderBy(F.col("cnt").desc(), "w").limit(topk)
    probe = top.select(
        "w", "cnt", F.explode(_cms_buckets_col(F.col("__h"))).alias("b")
    ).select("w", "cnt", "b.r", "b.bucket")
    return (
        probe.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("w", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_est"))
        .select(
            F.col("w").alias("token"),
            F.col("cnt").cast("long").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


def count_min_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return count_min_sketch_tokens(docs)


def _count_min_sql() -> str:
    from ..functions.text import MD5_60_SQL, TOKENS_SQL

    toks = TOKENS_SQL.format(col="text")
    h = MD5_60_SQL.format(e="w")
    bucket_union = "\n  UNION ALL ".join(
        f"SELECT w, cnt, {r} AS r, "
        f"(h >> {CMS_WIDTH_BITS * r}) & {_CMS_MASK} AS bucket FROM hashed"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH tok AS (SELECT unnest({toks}) AS w FROM documents),
vocab AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
hashed AS (SELECT w, cnt, {h} AS h FROM vocab),
buckets AS (
  {bucket_union}
),
cells AS (SELECT r, bucket, sum(cnt) AS cell
          FROM buckets GROUP BY r, bucket),
top AS (SELECT w, cnt FROM vocab ORDER BY cnt DESC, w LIMIT 20)
SELECT t.w AS token,
       CAST(t.cnt AS BIGINT) AS exact_cnt,
       CAST(min(c.cell) AS BIGINT) AS cms_est,
       CAST(min(c.cell) - t.cnt AS BIGINT) AS overcount
FROM top t
JOIN buckets b ON b.w = t.w
JOIN cells c ON c.r = b.r AND c.bucket = b.bucket
GROUP BY t.w, t.cnt
ORDER BY exact_cnt DESC, token
"""


SKETCH_QUERIES = {
    "agg_heavy_hitters": (heavy_hitters_query, HEAVY_HITTERS_SQL),
    "agg_kmv_distinct": (kmv_distinct_query, KMV_SQL),
    "agg_histogram_quantiles": (histogram_quantiles_query, HIST_QUANTILES_SQL),
    "agg_count_min_sketch": (count_min_query, _count_min_sql()),
}
