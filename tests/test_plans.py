"""Plan-quality assertions: the properties that keep these queries fast at
1000× the data — pushdown, pruning, broadcast joins, top-k, bounded
shuffles."""

from __future__ import annotations

from flink_cdc_log_connectors_spark.operators.relational import (
    q2,
    q5,
    q6,
    q8,
    q11,
    q14,
    q18,
)
from flink_cdc_log_connectors_spark.plans.inspect import (
    count_exchanges,
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
    uses_top_k,
)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    assert has_pushed_filters(q2(spark, sf_dir))
    assert has_pushed_filters(q8(spark, sf_dir))


def test_column_pruning(spark, sf_dir):
    cols = scan_read_schema(q11(spark, sf_dir))
    # 2-column projection must not read the other part columns
    assert set(cols) == {"p_partkey", "p_retailprice"}


def test_dimension_joins_broadcast(spark, sf_dir):
    assert uses_broadcast_join(q5(spark, sf_dir))
    assert uses_broadcast_join(q6(spark, sf_dir))
    assert uses_broadcast_join(q18(spark, sf_dir))


def test_topk_no_global_sort(spark, sf_dir):
    assert uses_top_k(q11(spark, sf_dir))
    assert uses_top_k(q2(spark, sf_dir))


def test_agg_query_single_shuffle(spark, sf_dir):
    # groupBy two cols: one exchange (partial+final agg); the ORDER BY adds
    # at most one more (tiny post-agg set)
    assert count_exchanges(q8(spark, sf_dir)) <= 2


def test_changelog_materialize_single_shuffle(spark, sf_dir):
    # window dedup: exactly one hash exchange on the key
    assert count_exchanges(q14(spark, sf_dir)) <= 2


def test_multijoin_no_fact_shuffle(spark, sf_dir):
    # customer→nation→region with broadcast dims: the fact side must not
    # shuffle before aggregation → agg exchange + order only
    assert count_exchanges(q6(spark, sf_dir)) <= 2


def test_hypertable_rollup_partial_agg_two_exchanges(spark, sf_dir):
    # two rollup levels → exactly one bucket-grained exchange each, plus
    # the final ORDER BY; never an exchange of raw event rows beyond the
    # first hash partitioning
    from flink_cdc_log_connectors_spark.operators.hypertable import (
        hypertable_rollup_query,
    )

    df = hypertable_rollup_query(spark, sf_dir)
    assert count_exchanges(df) <= 3
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    assert "HashAggregate" in executed_plan(df)  # partial+final, not sort-agg


def test_q21_token_freq_is_topk(spark, sf_dir):
    from flink_cdc_log_connectors_spark.operators.relational import q21

    df = q21(spark, sf_dir)
    # ORDER BY n DESC LIMIT 100 must compile to per-partition heaps
    assert uses_top_k(df)
    # one exchange for the token groupBy; TakeOrdered adds none
    assert count_exchanges(df) <= 1


def test_lsh_band_join_no_vector_shuffle(spark, sf_dir):
    """The band self-join must not carry embedding arrays: vectors join in
    only after candidate dedup (skinny-exchange discipline)."""
    from flink_cdc_log_connectors_spark.operators.similarity import (
        lsh_cosine_pairs,
    )
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    emb = load_table(spark, sf_dir, "embeddings")
    plan = executed_plan(lsh_cosine_pairs(emb))
    # the exploded band relation appears as (doc_id, k, band) hash exchange;
    # an embedding column inside that exchange would show as 'v' in the
    # partitioning struct — assert the band exchange is skinny
    import re

    band_exchanges = [
        seg for seg in plan.split("Exchange hashpartitioning")
        if seg.startswith("(")
    ]
    for seg in band_exchanges:
        head = seg[: seg.index(")")]
        if "band" in head:
            assert "v#" not in head and "embedding" not in head


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    from flink_cdc_log_connectors_spark.operators.text import (
        decontaminate_query,
    )

    # the eval set is tiny vs the corpus: its shingles must broadcast so
    # the corpus side is never shuffled before the per-doc rollup
    assert uses_broadcast_join(decontaminate_query(spark, sf_dir))


def test_rarity_bounded_shuffles(spark, sf_dir):
    from flink_cdc_log_connectors_spark.operators.text import rarity_query

    # token-frequency count + per-doc rollup (+ final order, + AQE's
    # optional vocab-join exchange) — bounded, no quadratic stage
    assert count_exchanges(rarity_query(spark, sf_dir)) <= 4


def test_pii_and_sample_no_shuffle(spark, sf_dir):
    """r3 map-only operators: at most the final ORDER BY exchange — the
    regex scrub and hash sampling must never shuffle data rows."""
    from flink_cdc_log_connectors_spark.operators.text import (
        pii_redact_query,
        stratified_sample_query,
    )

    # range-partitioned final sort = 1 exchange; nothing else allowed
    assert count_exchanges(pii_redact_query(spark, sf_dir)) <= 1
    assert count_exchanges(stratified_sample_query(spark, sf_dir)) <= 1


def test_winnow_no_data_shuffle(spark, sf_dir):
    """Winnowing is mapInPandas: only the conditional small-input
    repartition + final sort may exchange — never a per-gram shuffle
    (the pre-r3 window form's failure mode)."""
    from flink_cdc_log_connectors_spark.operators.text import winnow_query

    assert count_exchanges(winnow_query(spark, sf_dir)) <= 2


def test_keep_best_bounded_exchanges(spark, sf_dir):
    """Cluster policy = one window over cluster_id on skinny rows; the
    whole query (incl. the shared pair pipeline and final sort) stays
    within a fixed exchange budget."""
    from flink_cdc_log_connectors_spark.operators.graph import keep_best_per_cluster
    from pyspark.sql import functions as F

    clusters = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "doc_id long, cluster_id long"
    )
    docs = spark.createDataFrame(
        [(i, i * 3) for i in range(100)], "doc_id long, n_chars long"
    )
    out = keep_best_per_cluster(clusters, docs)
    # join on doc_id + window on cluster_id: ≤ 3 exchanges, no more
    assert count_exchanges(out) <= 3


def test_funnel_single_shuffle(spark, sf_dir):
    """The whole ordered-stage chain folds into one window partitioning:
    one exchange on user_id, every running-min stage coalesced over the
    same sort (the top-k output adds no global sort)."""
    from flink_cdc_log_connectors_spark.operators.temporal import funnel_query

    assert count_exchanges(funnel_query(spark, sf_dir)) <= 2


def test_repetition_stats_no_data_shuffle(spark, sf_dir):
    """Repetition stats are mapInPandas: only the conditional small-input
    repartition + final sort may exchange — never a per-gram shuffle."""
    from flink_cdc_log_connectors_spark.operators.text import (
        repetition_stats_query,
    )

    assert count_exchanges(repetition_stats_query(spark, sf_dir)) <= 2


def test_bm25_no_cartesian_and_bounded_exchanges(spark, sf_dir):
    """The scoring table joins broadcast; the corpus shuffles only for the
    tf/dl groupBys and the per-doc slot rollup."""
    from flink_cdc_log_connectors_spark.operators.search import bm25_query
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    plan = executed_plan(bm25_query(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_hypertable_additions_no_cartesian(spark, sf_dir):
    """first/last, delta, and downsampling stay keyed: no nested-loop or
    cartesian fallback anywhere in their physical plans."""
    from flink_cdc_log_connectors_spark.operators.hypertable import (
        delta_query,
        downsample_query,
        first_last_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    for q in (first_last_query, delta_query, downsample_query):
        plan = executed_plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


def test_q24_dims_broadcast_single_fact_shuffle(spark, sf_dir):
    """TPC-H Q5 shape: every dim side broadcasts; lineitem crosses one
    shuffle (the orders join) plus the aggregation exchange."""
    from flink_cdc_log_connectors_spark.operators.relational import q24
    from flink_cdc_log_connectors_spark.plans.inspect import (
        executed_plan,
        uses_broadcast_join,
    )

    df = q24(spark, sf_dir)
    assert uses_broadcast_join(df)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan


def test_anomaly_stats_broadcast(spark, sf_dir):
    """The per-key stats table joins back onto bucket rows as a broadcast
    — never a shuffle of the bucket side for a tiny stats table."""
    from flink_cdc_log_connectors_spark.operators.temporal import anomaly_query
    from flink_cdc_log_connectors_spark.plans.inspect import uses_broadcast_join

    assert uses_broadcast_join(anomaly_query(spark, sf_dir))


def test_top_paths_single_window_shuffle(spark, sf_dir):
    """All lag slots share one Window sort; only the tiny path aggregation
    and the top-k remain."""
    from flink_cdc_log_connectors_spark.operators.temporal import top_paths_query
    from flink_cdc_log_connectors_spark.plans.inspect import (
        count_exchanges,
        uses_top_k,
    )

    df = top_paths_query(spark, sf_dir)
    assert count_exchanges(df) <= 3
    assert uses_top_k(df)


def test_quality_filter_two_passes_one_join(spark, sf_dir):
    """Token stats (Catalyst) + repetition (mapInPandas) join once on
    doc_id; no third scan of the text column."""
    from flink_cdc_log_connectors_spark.operators.text import (
        quality_filter_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    plan = executed_plan(quality_filter_query(spark, sf_dir))
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan


def test_importance_sample_no_shuffle(spark, sf_dir):
    """Deterministic Bernoulli keep is map-only: zero exchanges before
    the ordered output."""
    from flink_cdc_log_connectors_spark.operators.text import (
        importance_sample_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import count_exchanges

    assert count_exchanges(importance_sample_query(spark, sf_dir)) <= 1


def test_emb_outlier_centroids_broadcast(spark, sf_dir):
    """The O(cells × dim) centroid table broadcasts back onto component
    rows — the vector side never shuffles for the join."""
    from flink_cdc_log_connectors_spark.operators.similarity import (
        emb_outlier_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import uses_broadcast_join

    assert uses_broadcast_join(emb_outlier_query(spark, sf_dir))


def test_audio_rms_map_only(spark, sf_dir):
    """Audio windowing is a pure mapInPandas fan-out: no shuffle before
    the ordered output."""
    from flink_cdc_log_connectors_spark.operators.multimodal import (
        mm_audio_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import count_exchanges

    assert count_exchanges(mm_audio_query(spark, sf_dir)) <= 1


def test_gini_histogram_window_is_tiny(spark, sf_dir):
    """The Gini rank window runs over the count HISTOGRAM (a handful of
    rows), never the key table: total exchanges stay minimal and no
    per-key global sort appears."""
    from flink_cdc_log_connectors_spark.operators.temporal import gini_query
    from flink_cdc_log_connectors_spark.plans.inspect import count_exchanges

    assert count_exchanges(gini_query(spark, sf_dir)) <= 4


def test_r4_new_operator_plan_shapes(spark, sf_dir):
    """Pin the r4 additions' physical shapes: bounded exchange counts, a
    single scan where the operator is single-pass, and the pushed filter
    on q25's fact side."""
    from flink_cdc_log_connectors_spark.operators.curation import (
        pack_sequences_query,
    )
    from flink_cdc_log_connectors_spark.operators.dedup import (
        segment_dedup_query,
        semdedup_query,
    )
    from flink_cdc_log_connectors_spark.operators.relational import q25
    from flink_cdc_log_connectors_spark.operators.sketch import (
        histogram_quantiles_query,
    )
    from flink_cdc_log_connectors_spark.operators.similarity import (
        random_projection_query,
    )

    # q25: pushed ship-date filter, broadcast dims, agg + sort exchanges only
    df = q25(spark, sf_dir)
    assert has_pushed_filters(df)
    assert uses_broadcast_join(df)
    assert count_exchanges(df) <= 2

    # segment dedup: token agg + seg-key window + doc agg + order — 4 keyed
    assert count_exchanges(segment_dedup_query(spark, sf_dir)) <= 4

    # packing: one per-shard window partitioning + 8-row agg/sort
    assert count_exchanges(pack_sequences_query(spark, sf_dir)) <= 3

    # histogram quantiles: stats agg + bin agg + tiny histogram-side work
    assert count_exchanges(histogram_quantiles_query(spark, sf_dir)) <= 5

    # random projection: map-only scan + final order — no data shuffle
    assert count_exchanges(random_projection_query(spark, sf_dir)) <= 1

    # semdedup: cell-blocked pairs + domination agg + join back + order
    assert count_exchanges(semdedup_query(spark, sf_dir)) <= 5


def test_r5_queries_no_nested_loop_bounded_exchanges(spark, sf_dir):
    """The r5 join-shape-sensitive queries: Q19's OR-of-triples and Q4's
    interval condition must stay on hash joins (no BroadcastNestedLoop /
    Cartesian), Q21's exists/not-exists pair shares the orderkey shuffle,
    and the triangle wedge joins are all equi-joins."""
    from flink_cdc_log_connectors_spark.operators.relational import (
        q35,
        q37,
        q38,
    )
    from flink_cdc_log_connectors_spark.operators.graph import (
        triangle_count_query,
    )
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    for fn, max_ex in ((q35, 4), (q37, 6), (q38, 3)):
        df = fn(spark, sf_dir)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert count_exchanges(df) <= max_ex, fn.__name__
    # triangle_count materializes the wedge joins eagerly (localCheckpoint
    # + count), so the returned plan holds only the bounded stats joins:
    # the documented 1-row scalar crossJoins (≤2 BNLJ) and nothing else
    plan = executed_plan(triangle_count_query(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    # the wedge join's exact pattern — equi on src PLUS a struct-rank
    # inequality — must still plan as a hash/sort-merge join with the
    # inequality as a post-join condition, not degrade to a nested loop
    from pyspark.sql import functions as F

    o = spark.range(0, 50).select(
        F.col("id").alias("src"),
        ((F.col("id") * 7) % 50).alias("dst"),
        F.struct(
            (F.col("id") % 5).alias("deg"), F.col("id").alias("node")
        ).alias("rdst"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.rdst") < F.col("e2.rdst")),
    )
    pl = executed_plan(wedges)
    assert "BroadcastNestedLoop" not in pl and "CartesianProduct" not in pl


def test_lm_and_chunking_plan_shape(spark, sf_dir):
    """lm_bigram_train: one corpus-sized token shuffle + vocab-sized
    aggregates (the 1-row V aggregate broadcasts); corpus_chunk_windows:
    map-only — ZERO exchanges before the output sort."""
    from flink_cdc_log_connectors_spark.operators.curation import (
        chunk_windows,
    )
    from flink_cdc_log_connectors_spark.operators.lm import bigram_lm_query
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.plans.inspect import executed_plan

    docs = load_table(spark, sf_dir, "documents")
    assert count_exchanges(chunk_windows(docs)) == 0
    lm = bigram_lm_query(spark, sf_dir)
    plan = executed_plan(lm)
    assert "CartesianProduct" not in plan
    # exactly one BNLJ: the documented 1-row vocabulary-size crossJoin;
    # the count joins themselves are hash joins
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
