"""10× scale smoke: do the headline pipeline operators hold their shape
when the corpus grows an order of magnitude?

Synthesizes a 10×-sf0.1 documents/embeddings corpus under /tmp (50k docs /
20k vectors) by unioning re-keyed copies of the sf0.1 tables.  Copies
must be pairwise DISJOINT — otherwise the true near-dup answer itself
grows quadratically (10 identical copies = 45 true pairs per family) and
the smoke measures answer size, not plan scaling (the first cut did
exactly that: 31× on simsearch was all genuine new pairs).  So every
token gets a per-copy suffix (intra-copy shingle/dup structure preserved
exactly, cross-copy Jaccard 0) and every embedding is rotated by its
copy index (norms and intra-copy angles preserved, cross-copy cosine
decorrelated).  Then the heaviest dedup / similarity / text entries run
at both scales and the per-entry wall-clock ratio is reported.

This is NOT a correctness gate (the oracles already run at sf0.01); it is
the empirical leg of SCALING.md: a plan whose runtime grows ~linearly
from sf0.1 → 10×sf0.1 on fixed cores is shuffling what it claims to
shuffle.  Quadratic candidate blowups or driver-side materialization
would show up as super-linear wall-clock or OOM here.

Usage: python scripts/scale_smoke.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale10"
#: synthesis-recipe version, stored inside the _SUCCESS marker: bump when
#: the fixture construction changes so a cached dir from an older recipe
#: (e.g. pre-r5, where events.parquet was a SYMLINK to the unscaled base)
#: is rebuilt instead of silently measured as "10x" data
RECIPE = "v3-maxid-stride"

#: the entries whose 100 TB story most depends on sub-quadratic candidate
#: generation / bounded shuffles
ENTRIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_wide",
    "dedup_substring_span",
    "dedup_segment_exact",
    "text_winnow_fingerprint",
    "text_token_stats",
    "simsearch_lsh_cosine",
    "ann_ivf_pq",
    "corpus_pack_sequences",
    "agg_histogram_quantiles",
    # r5 additions (VERDICT r4 next-round #8): the r4-late entries whose
    # scale story was analytical only, plus the hot-key changelog stress
    "bpe_encode_corpus",
    "dedup_pagerank_centrality",
    "events_session_window_tvf",
    "changelog_skew_hotkey",
    # r5-late: the corpus-shuffling LM entries and the map-only chunker
    "lm_bigram_train",
    "lm_doc_bigram_bits",
    "corpus_chunk_windows",
    "graph_triangle_count",
    # r6: hybrid retrieval — broadcast query legs + skinny rank windows
    # must hold as the corpus grows (query count fixed)
    "search_hybrid_rrf",
    # r6: the planner-driven default simhash path (not a registry entry —
    # injected in main): picks narrow 15-bit bands at sf0.1 (5k docs) and
    # auto-switches to the wide 30-bit fingerprint at 10× (50k docs >
    # 2^15), so its ratio should track the measured wide number (~3.2×),
    # not the narrow saturation (~5.3×)
    "dedup_simhash_auto",
]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    from flink_cdc_log_connectors_spark.io import load_table

    marker = os.path.join(OUT, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == RECIPE:
                return
        # stale fixture from an older synthesis recipe — rebuild
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()
    def suffixed(i: int):
        # per-copy token suffix: intra-copy dup/shingle structure is
        # byte-identical, cross-copy token overlap is zero.  The suffix
        # must be ALPHANUMERIC — the engine tokenizer splits on
        # [^a-z0-9]+, so an underscore would fragment every token and
        # inject shared digit tokens into every shingle (measured: that
        # inflated intra-copy pair counts 750×)
        return F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"q{i}")),
            ),
        )

    doc_copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            suffixed(i).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(COPIES)
    ]
    out = doc_copies[0]
    for d in doc_copies[1:]:
        out = out.unionAll(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    dim = len(emb.select("embedding").first()[0])

    def rotated(i: int):
        # cyclic rotation by the copy index: norms and intra-copy angles
        # preserved exactly; cross-copy cosine decorrelated
        if i == 0:
            return F.col("embedding")
        return F.concat(
            F.slice(F.col("embedding"), i + 1, dim - i),
            F.slice(F.col("embedding"), 1, i),
        )

    emb_copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n_vecs)).alias("vec_id"),
            rotated(i).alias("embedding"),
            "label",
        )
        for i in range(COPIES)
    ]
    eout = emb_copies[0]
    for e in emb_copies[1:]:
        eout = eout.unionAll(e)
    eout.repartition(16).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )
    # events scales too (session/changelog entries): per-copy re-keyed
    # event_id AND user_id, so per-user session structure is preserved
    # within a copy while key cardinality and the hot-key fan-in
    # (event_id % 10 = 0 → k=-1 in changelog_skew_hotkey) both grow 10×
    ev = load_table(spark, BASE, "events")
    # stride by max(id)+1, not count(): sparse/offset event_id values
    # would otherwise collide across copies and distort the scaled key
    # distribution (incl. the event_id % 10 hot-key ratio the smoke
    # measures)
    max_event = ev.agg(F.max("event_id")).first()[0] + 1
    max_user = ev.agg(F.max("user_id")).first()[0] + 1
    ev_copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * max_event)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * max_user)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(COPIES)
    ]
    evout = ev_copies[0]
    for e in ev_copies[1:]:
        evout = evout.unionAll(e)
    evout.repartition(16).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )
    # the relational entries aren't part of the smoke; link the rest so
    # load_table resolves every name at the scaled dir
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(os.path.join(OUT, "_SUCCESS"), "w") as fh:
        fh.write(RECIPE)


def main() -> None:
    from flink_cdc_log_connectors_spark.registry import all_queries
    from flink_cdc_log_connectors_spark.session import get_spark

    spark = get_spark("scale-smoke", master="local[32]")
    synthesize(spark)
    qs = dict(all_queries())

    def _simhash_auto_entry(spark, sf_dir):
        from flink_cdc_log_connectors_spark.io import load_table
        from flink_cdc_log_connectors_spark.operators.dedup import (
            simhash_dedup_auto,
        )

        return simhash_dedup_auto(load_table(spark, sf_dir, "documents"))

    qs["dedup_simhash_auto"] = (_simhash_auto_entry, None)
    print(f"{'entry':28s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    worst = 0.0
    for name in ENTRIES:
        fn = qs[name][0]
        # warm BOTH scales once (codegen + the per-(process, sf_dir)
        # shared signature/pair caches), then time a fresh plan each —
        # steady state on both sides, the same regime bench.py's
        # per-query minima measure.  Without the 10× warmup the ratio
        # charges cache materialization to the big side only.
        fn(spark, BASE).count()
        fn(spark, OUT).count()
        t0 = time.time()
        fn(spark, BASE).count()
        base_s = time.time() - t0
        t0 = time.time()
        n = fn(spark, OUT).count()
        big_s = time.time() - t0
        ratio = big_s / max(base_s, 1e-9)
        worst = max(worst, ratio)
        print(
            f"{name:28s} {base_s:8.2f} {big_s:8.2f} {ratio:5.1f}x  rows={n}"
        )
    print(
        f"worst ratio {worst:.1f}x on {COPIES}x data "
        f"({'OK — sub-quadratic' if worst < COPIES * 2.5 else 'SUSPECT'})"
    )
    if "--keep" not in sys.argv:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
