"""BM25 retrieval: hand-checkable ranking semantics + plan shape."""

from __future__ import annotations

from flink_cdc_log_connectors_spark.operators.search import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_more_matching_terms_rank_higher(spark):
    docs = _docs(spark, [
        (1, "spark join window extra words here"),
        (2, "spark join other words here indeed"),
        (3, "spark alone with filler words here"),
        (4, "nothing relevant at all friend"),
    ])
    out = bm25_topk(docs, queries=((1, ("spark", "join", "window")),)).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])]
    assert ranked == [1, 2, 3]  # doc 4 matches nothing → absent


def test_bm25_rare_term_outweighs_common(spark):
    # "zebra" appears in 1 doc, "common" in all: the zebra doc must beat
    # docs matching only the ubiquitous term
    docs = _docs(spark, [
        (1, "common zebra pad pad pad pad"),
        (2, "common pad2 pad2 pad2 pad2 pad2"),
        (3, "common pad3 pad3 pad3 pad3 pad3"),
    ])
    out = bm25_topk(docs, queries=((1, ("common", "zebra")),)).collect()
    top = min(out, key=lambda r: r["rk"])
    assert top["doc_id"] == 1


def test_bm25_repetition_saturates(spark):
    # k1 saturation: 5 occurrences in an equal-length doc beats 1, but by
    # less than 5x (score bounded by idf*(k1+1))
    docs = _docs(spark, [
        (1, "term term term term term pad"),
        (2, "term pad pad pad pad pad"),
        (3, "none here at all pad pad"),
    ])
    out = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, queries=((1, ("term",)),)).collect()}
    assert out[1] > out[2] > 0
    assert out[1] < 5 * out[2]


def test_bm25_plan_broadcasts_scoring_table(spark, sf_dir):
    from flink_cdc_log_connectors_spark.operators.search import bm25_query
    from flink_cdc_log_connectors_spark.plans.inspect import (
        uses_broadcast_join,
    )

    assert uses_broadcast_join(bm25_query(spark, sf_dir))
