"""Bloom-prune join exactness and Misra–Gries guarantee bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.operators.bloomfilter import (
    bloom_prune,
    bloom_semi_join,
    build_bloom,
)
from flink_cdc_log_connectors_spark.operators.sketch import (
    heavy_hitters,
    misra_gries_topk,
)


def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", num_bits=1 << 12)
    kept = {r["k"] for r in bloom_prune(probe, bloom, "k", num_bits=1 << 12).collect()}
    # every true member survives pruning
    assert set(range(100)) <= kept


def test_bloom_prunes_most_non_members(spark):
    # tiny filter, big probe: with m=4096 bits / 100 keys / k=5 hashes the
    # fp rate is well under 5% — pruning must remove the bulk of the 90%
    # non-matching probe rows
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 10000).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", num_bits=1 << 12)
    n_kept = bloom_prune(probe, bloom, "k", num_bits=1 << 12).count()
    assert 100 <= n_kept < 100 + 0.05 * 9900


def test_bloom_semi_join_exact(spark):
    # false positives are removed by the exact join: result == plain semi
    build = spark.range(0, 50).select((F.col("id") * 3).alias("bk"))
    probe = spark.range(0, 500).select(F.col("id").alias("pk"))
    got = sorted(
        r["pk"]
        for r in bloom_semi_join(
            probe, build, "pk", "bk", num_bits=1 << 8  # tiny → many fps
        ).collect()
    )
    want = sorted(i for i in range(500) if i % 3 == 0 and i < 150)
    assert got == want


def test_bloom_empty_build_prunes_everything(spark):
    build = spark.range(0, 0).select(F.col("id").alias("k"))
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", num_bits=1 << 10)
    assert bloom_prune(probe, bloom, "k", num_bits=1 << 10).count() == 0


def test_bloom_prune_is_map_only(spark):
    """The pruning stage must not shuffle the probe side: its plan contains
    the 1-row broadcast join and NO other exchange of probe data."""
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", num_bits=1 << 12)
    plan = executed_plan(bloom_prune(probe, bloom, "k", num_bits=1 << 12))
    # probe side: only a BroadcastExchange (the 1-row bloom) may appear —
    # no shuffle exchange downstream of the probe scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_misra_gries_guarantee(spark):
    # skewed stream: item i appears (1000 - i*90) times for i in 0..9 plus
    # 2000 singletons; n = sum.  With k=20 every item of true frequency
    # > n/(k+1) must be reported, and estimates never overcount.
    rows = []
    freqs = {}
    for i in range(10):
        f = 1000 - i * 90
        freqs[str(i)] = f
        rows += [(str(i),)] * f
    for j in range(2000):
        rows.append((f"tail{j}",))
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n = len(rows)
    k = 20
    got = {r["item"]: r["est"] for r in misra_gries_topk(df, "item", k).collect()}
    bound = n / (k + 1)
    for item, f in freqs.items():
        if f > bound:
            assert item in got, f"{item} (freq {f} > {bound:.0f}) missing"
    for item, est in got.items():
        true = freqs.get(item, 1)
        assert est <= true, f"{item}: est {est} overcounts true {true}"
        assert est >= true - bound - 1


def test_exact_heavy_hitters_matches_naive(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 2
    df = spark.createDataFrame(rows, "item string")
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", 0.1).collect()}
    assert got == {"a": 50, "b": 30}


def test_kmv_estimate_accuracy(spark):
    """KMV with k=64: relative error on a 5000-distinct group stays well
    inside the ~3/sqrt(k) (≈ 37%) envelope, and groups under k report
    exactly."""
    from flink_cdc_log_connectors_spark.operators.sketch import kmv_distinct

    rows = [("big", i) for i in range(5000)] + [("small", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in kmv_distinct(df, "g", "v").collect()}
    assert got["small"]["est_distinct"] == 40.0  # < k → exact
    est = got["big"]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.37, est


def test_histogram_quantiles_within_bin_width(spark, sf_dir):
    """The histogram estimate must sit within one bin width of the exact
    quantile (the sketch's stated error bound)."""
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.operators.sketch import (
        HIST_BINS,
        histogram_quantiles_query,
    )
    from pyspark.sql import functions as F

    est = {
        (r["l_returnflag"], r["q"]): r["est"]
        for r in histogram_quantiles_query(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
        ).alias("p"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()
    assert est
    for r in exact:
        width = (r["hi"] - r["lo"]) / HIST_BINS
        for q, ex in zip((0.5, 0.9, 0.99), r["p"]):
            e = est[(r["l_returnflag"], q)]
            assert abs(e - ex) <= width + 1e-9, (
                f"{r['l_returnflag']} q={q}: est {e} vs exact {ex}, "
                f"width {width}"
            )


def test_histogram_quantiles_degenerate_group(spark):
    """A single-valued group (hi == lo) must report the value itself for
    every quantile instead of dividing by zero bin width."""
    from flink_cdc_log_connectors_spark.operators.sketch import (
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("flat", 5.0)] * 7 + [("spread", float(v)) for v in range(1, 101)],
        "g string, x double",
    )
    rows = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantiles(df, "g", "x").collect()
    }
    assert rows[("flat", 0.5)] == 5.0
    assert rows[("flat", 0.99)] == 5.0
    assert 50.0 <= rows[("spread", 0.5)] <= 52.0
    assert rows[("spread", 0.99)] >= 99.0


def test_histogram_quantiles_ignores_nulls(spark):
    """NULL values must be excluded from both n and the bins — a NULL
    bin would skew every rank and diverge across engines' NULL sort
    orders."""
    from flink_cdc_log_connectors_spark.operators.sketch import (
        histogram_quantiles,
    )

    rows = [("g", float(v)) for v in range(1, 51)] + [("g", None)] * 50
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r["q"]: (r["est"], r["n"])
           for r in histogram_quantiles(df, "g", "x").collect()}
    assert out[0.5][1] == 50          # n counts non-null only
    assert 25.0 <= out[0.5][0] <= 26.5
    assert out[0.99][0] >= 49.0


def test_count_min_never_undercounts(spark, sf_dir):
    """CMS guarantee: estimate >= exact for every probed token, and a
    token whose three cells collide with nothing reports exactly."""
    from flink_cdc_log_connectors_spark.operators.sketch import (
        count_min_sketch_tokens,
    )
    from flink_cdc_log_connectors_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = count_min_sketch_tokens(docs, topk=50).collect()
    # sf0.001's template vocabulary is tiny (~31 distinct tokens) — the
    # probe returns min(topk, |vocab|) rows
    assert 0 < len(rows) <= 50
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    assert all(r["overcount"] == r["cms_est"] - r["exact_cnt"] for r in rows)
