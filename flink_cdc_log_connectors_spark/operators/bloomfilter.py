"""Bloom-filter join pruning: runtime semi-join reduction for big joins.

The 100 TB problem: ``fact ⋈ selective-dim`` shuffles the ENTIRE fact
table even when only a sliver of it joins.  Spark's own runtime row-group
filtering helps at the scan; this operator generalizes the idea to any
build side that is too big to broadcast EXACTLY but whose key-membership
fits in a few hundred KB of bloom bits:

1. build: one distributed aggregation folds the build side's join keys
   into an m-bit bloom (k Murmur3-derived hash positions — ``F.hash``
   with a mixed-in function index — ``bit_or`` over 64-bit words) —
   output size is O(m), INDEPENDENT of build cardinality;
2. prune: the bloom words broadcast as ONE row (a 1-row broadcast
   nested-loop join is a map-only operator) and the probe side filters on
   the k bit tests in whole-stage codegen — no shuffle, no Python;
3. exact join afterwards: bloom false positives are eliminated by the
   real join, so results are EXACT (the oracle is the plain join).

At 1000 executors this turns a full-fact shuffle into a map-only scan
that discards non-joining rows at the source, shuffling only survivors
(expected: matches + fp_rate × non-matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k hash-function bit positions of a key: Murmur3 (``F.hash``) with
    the function index mixed in as a second hashed column — k distinct
    codegen'd hash functions with no 64-bit multiply (ANSI-mode safe; the
    driver's vanilla Spark 4 session runs with ANSI on, where an
    overflowing multiply-shift hash would throw)."""
    return [
        F.pmod(F.hash(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    build: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """Fold the build side's keys into bloom words: a 1-row DataFrame with
    an ``array<long>`` of ``num_bits/64`` words.  One aggregation whose
    output size is fixed by ``num_bits`` — never by build cardinality."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = _bit_positions(F.col(key_col), num_bits, num_hashes)
    exploded = build.select(
        F.explode(F.array(*pos)).alias("__p")
    ).selectExpr(
        "cast(__p div 64 as int) as __w",
        "shiftleft(1L, cast(pmod(__p, 64) as int)) as __bit",
    )
    words = exploded.groupBy("__w").agg(F.bit_or("__bit").alias("__word"))
    # collapse the ≤ n_words set rows into one dense array row (missing
    # words are 0): map lookup per slot — O(n_words), runs on ≤ n_words rows
    sparse = words.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__word"))
        ).alias("__m")
    )
    return sparse.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom_words")
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter the probe side to rows whose key MAY be in the bloom.

    The bloom is one row, so the crossJoin broadcasts a single row — a
    map-only operator (no probe-side shuffle); the k bit tests are
    codegen'd long arithmetic.  Guaranteed no false negatives."""
    pos = _bit_positions(F.col(key_col), num_bits, num_hashes)
    probed = probe.crossJoin(F.broadcast(bloom))
    for i, p in enumerate(pos):
        probed = probed.withColumn(f"__bp{i}", p)
    test = " AND ".join(
        f"(element_at(bloom_words, cast(__bp{i} div 64 as int) + 1)"
        f" & shiftleft(1L, cast(pmod(__bp{i}, 64) as int))) != 0"
        for i in range(num_hashes)
    )
    return probed.filter(F.expr(test)).drop(
        "bloom_words", *[f"__bp{i}" for i in range(num_hashes)]
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact join of probe against build keys, bloom-pruned first: the
    pruned probe (matches + false positives) flows into the exact join,
    which removes the false positives — identical results to the plain
    join, shuffling only the bloom survivors."""
    bloom = build_bloom(build, build_key, num_bits, num_hashes)
    pruned = bloom_prune(probe, bloom, probe_key, num_bits, num_hashes)
    return pruned.join(
        build, pruned[probe_key] == build[build_key], "left_semi"
    )


# --------------------------------------------------------------------------
# registry query
# --------------------------------------------------------------------------


def bloom_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to urgent high-value orders: the fact
    table is bloom-pruned on the selective order set before the exact
    semi join.  The oracle is the plain join — equality proves bloom
    pruning loses nothing and the exact join removes false positives."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sel = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > F.lit(150000.0))
    ).select("o_orderkey")
    pruned = bloom_semi_join(
        lineitem, sel, "l_orderkey", "o_orderkey", num_bits=1 << 16
    )
    return (
        pruned.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


BLOOM_JOIN_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


BLOOM_QUERIES = {
    "join_bloom_prune": (bloom_join_query, BLOOM_JOIN_SQL),
}
