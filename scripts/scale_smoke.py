"""10× scale smoke: do the headline pipeline operators hold their shape
when the corpus grows an order of magnitude?

Synthesizes a 10×-sf0.1 documents/embeddings corpus under /tmp (50k docs /
20k vectors) by unioning shifted copies of the sf0.1 tables — doc_ids and
vec_ids are re-keyed per copy, text gets a copy-local marker token so
cross-copy near-dup structure stays realistic (each copy repeats the
original's intra-copy duplicate families), then runs the heaviest
dedup / similarity / text entries and reports wall-clock plus the
per-entry scale factor vs the same query at sf0.1.

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

#: the entries whose 100 TB story most depends on sub-quadratic candidate
#: generation / bounded shuffles
ENTRIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring_span",
    "dedup_segment_exact",
    "text_winnow_fingerprint",
    "text_token_stats",
    "simsearch_lsh_cosine",
    "ann_ivf_pq",
    "corpus_pack_sequences",
    "agg_histogram_quantiles",
]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    from flink_cdc_log_connectors_spark.io import load_table

    if os.path.exists(os.path.join(OUT, "_SUCCESS")):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()
    doc_copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            # marker token keeps copies from being exact duplicates of
            # each other while preserving intra-copy dup families
            F.concat(F.lit(f"copy{i} "), F.col("text")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(6)).alias("n_chars"),
        )
        for i in range(COPIES)
    ]
    out = doc_copies[0]
    for d in doc_copies[1:]:
        out = out.unionAll(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    emb_copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n_vecs)).alias("vec_id"),
            "embedding",
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
    # the relational entries aren't part of the smoke; link the rest so
    # load_table resolves every name at the scaled dir
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    open(os.path.join(OUT, "_SUCCESS"), "w").close()


def main() -> None:
    from flink_cdc_log_connectors_spark.registry import all_queries
    from flink_cdc_log_connectors_spark.session import get_spark

    spark = get_spark("scale-smoke", master="local[32]")
    synthesize(spark)
    qs = all_queries()
    print(f"{'entry':28s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    worst = 0.0
    for name in ENTRIES:
        fn = qs[name][0]
        # fresh plans both sides; one warmup at base scale amortizes
        # session/codegen costs out of the comparison
        fn(spark, BASE).count()
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
