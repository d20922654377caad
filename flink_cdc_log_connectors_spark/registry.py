"""Central query registry: every operator the engine claims, with its oracle.

The driver contract (``__spark_entry__.py``) exposes ``queries()`` and
``oracle_sql()``; both are assembled from here.  An oracle of ``None`` means
the operator is not ANSI-SQL-expressible (the driver then records a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from .operators.relational import RELATIONAL_QUERIES

    out: dict[str, tuple[QueryFn, str | None]] = {}
    out.update(RELATIONAL_QUERIES)

    try:
        from .operators.dedup import DEDUP_QUERIES

        out.update(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.text import TEXT_QUERIES

        out.update(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.similarity import SIMILARITY_QUERIES

        out.update(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.multimodal import MULTIMODAL_QUERIES

        out.update(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.temporal import TEMPORAL_QUERIES

        out.update(TEMPORAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.hypertable import HYPERTABLE_QUERIES

        out.update(HYPERTABLE_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.graph import GRAPH_QUERIES

        out.update(GRAPH_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.clustering import CLUSTERING_QUERIES

        out.update(CLUSTERING_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.search import SEARCH_QUERIES

        out.update(SEARCH_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.windows import WINDOW_QUERIES

        out.update(WINDOW_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.bloomfilter import BLOOM_QUERIES

        out.update(BLOOM_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.sketch import SKETCH_QUERIES

        out.update(SKETCH_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.skew import SKEW_QUERIES

        out.update(SKEW_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.lifecycle import LIFECYCLE_QUERIES

        out.update(LIFECYCLE_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.curation import CURATION_QUERIES

        out.update(CURATION_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.lm import LM_QUERIES

        out.update(LM_QUERIES)
    except ImportError:
        pass
    return _driver_window_order(out)


#: The driver's CORRECTNESS record holds a bounded window of rows (50 in
#: rounds 1-3) taken in REGISTRY ITERATION ORDER, so ordering controls
#: which entries get a durable on-the-record check each round.  Rotation
#: policy (VERDICT r3 What's-wrong #2): (a) entries that have NEVER had a
#: driver row on ANY round sort first — before anything new; (b) entries
#: whose CODE changed this round and must be re-proven; (c) entries new
#: this round; (d) refresh the stalest evidence — entries whose last
#: driver row is r1/r2 (50 of them; ~35 fit this window, the rest lead
#: category (d) next round).  The full registry is additionally covered
#: every round by the committed scripts/selfcheck.py run
#: (SELFCHECK_r{N}.json).
_DRIVER_WINDOW_PRIORITY = [
    # (b) code changed this round: sessionize_events reshaped limit-free
    # (VERDICT r4 next-round #1 — the one red driver row; its full-output
    # twin events_session_window_tvf proved the gap arithmetic green)
    "sessionize_events",
    # (c) new in r5 — unproven until their first driver row (appended as
    # the round progresses, kept ahead of the stale-refresh band)
    "changelog_skew_hotkey",
    "q35_order_priority_check",
    "q36_shipmode_priority",
    "q37_waiting_suppliers",
    "q38_disjunctive_revenue",
    "q39_nation_profit",
    "graph_triangle_count",
    "corpus_reservoir_topk",
    "lm_bigram_train",
    "corpus_chunk_windows",
    # (d) stale-evidence refresh: every entry whose last driver row is
    # r1/r2 (39 of them; the 50-row window holds priority (b)+(c)+39)
    "q09_rollup",
    "q09b_cube",
    "q10a_topk_window",
    "q10b_running_sum",
    "q11_topk",
    "q12a_intersect",
    "q12b_except",
    "q12c_union_agg",
    "q13_scalars",
    "q14_changelog_materialize",
    "q14b_changelog_maxby",
    "q15_op_breakdown",
    "q16_tumbling_window",
    "q17_json_extract",
    "q18_correlated_subquery",
    "q19_pivot",
    "q20_percentiles",
    "q21_token_freq",
    "q22_grouping_sets",
    "q23_shipping_priority",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_hamming_topk",
    "ann_ivf_label",
    "ann_ivf_multiprobe",
    "simsearch_int8_pairs",
    "simsearch_lsh_cosine",
    "text_token_stats",
    "text_lang_id",
    "text_fingerprint",
    "text_bpe_tokens",
    "text_rarity_quality",
    "text_decontaminate",
    "text_winnow_fingerprint",
    "pipeline_clean_corpus",
    # past the 50-row driver window this round (selfcheck-covered; lead
    # the r6 window): the r5-late entries
    "lm_doc_bigram_bits",
    "ann_ivf_recall",
    "events_watermark_planning",
    "lm_stupid_backoff",
    "corpus_snapshot_diff",
    "agg_salted_hotkey",
    "mm_phash_pairs",
]


def _driver_window_order(
    out: dict[str, tuple[QueryFn, str | None]]
) -> dict[str, tuple[QueryFn, str | None]]:
    ordered: dict[str, tuple[QueryFn, str | None]] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in out:
            ordered[name] = out[name]
    for name, v in out.items():
        if name not in ordered:
            ordered[name] = v
    return ordered
