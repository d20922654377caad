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
