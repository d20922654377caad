"""Streaming ingestion dedup: minhash-LSH a document stream against the
ACCUMULATED corpus index — the training-pipeline pattern where new data
must be deduped against everything already ingested, not just its own
microbatch.

Per microbatch (``foreachBatch``):

1. shingle + sign the batch with the SAME md5-60 / universal-hash
   machinery as the batch operators (``operators.dedup``);
2. candidate pairs = new-vs-index band-bucket join ∪ new-vs-new
   band self-join — the batch never joins the full corpus, only its
   band-bucket collisions;
3. exact Jaccard verification over stored shingle sets;
4. verified pairs append to ``pairs/``; the batch's bands + shingle
   sets append to the index.

Index layout (under ``index_path``):

- ``bands/``  — (band_idx, bh, doc_id) parquet, appended per batch;
- ``shsets/`` — (doc_id, shset) parquet, appended per batch.

At 100 TB the band table is the only thing the stream joins against;
stored bucketed by ``bh`` it is a bucket-local join.  Appends are
idempotent per epoch ONLY at the pairs output (epoch column, dedup on
read); a retried epoch may re-append its index rows, which is harmless
for correctness (band join candidates and shingle sets deduplicate by
doc_id before use).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hashed_word_ngrams
from ..operators.dedup import BANDS, ROWS_PER_BAND, _band_bucket, minhash_signatures


def _batch_bands(doc_sets: DataFrame) -> DataFrame:
    sh = doc_sets.select("doc_id", F.explode("shset").alias("sh"))
    sig = minhash_signatures(sh)
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), _band_bucket(b).alias("bh"))
                    for b in range(BANDS)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band_idx", "e.bh")


def _verify_pairs(
    cand: DataFrame,
    shsets: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    d1 = shsets.alias("d1")
    d2 = shsets.alias("d2")
    return (
        cand.join(d1, cand.d1 == F.col("d1.doc_id"))
        .join(d2, cand.d2 == F.col("d2.doc_id"))
        .withColumn(
            "common", F.size(F.array_intersect(F.col("d1.shset"), F.col("d2.shset")))
        )
        .withColumn(
            "union_sz",
            F.size(F.col("d1.shset")) + F.size(F.col("d2.shset")) - F.col("common"),
        )
        .filter(
            F.lit(threshold_den) * F.col("common")
            >= F.lit(threshold_num) * F.col("union_sz")
        )
        .select(
            cand.d1,
            cand.d2,
            (F.col("common").cast("double") / F.col("union_sz")).alias("jaccard"),
        )
    )


def streaming_minhash_dedup(
    stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Returns a ``DataStreamWriter`` running the ingestion-dedup loop.
    Verified near-dup pairs land under ``{index_path}/pairs`` with the
    epoch id; read them back with :func:`read_dedup_pairs`."""

    bands_dir = os.path.join(index_path, "bands")
    shsets_dir = os.path.join(index_path, "shsets")
    pairs_dir = os.path.join(index_path, "pairs")

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        doc_sets = batch.select(
            F.col(id_col).alias("doc_id"),
            hashed_word_ngrams(F.col(text_col), n).alias("shset"),
        ).persist()
        try:
            new_bands = _batch_bands(doc_sets).persist()
            # new-vs-new candidates (within the batch)
            a, b = new_bands.alias("a"), new_bands.alias("b")
            intra = (
                a.join(
                    b,
                    (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            )
            # new-vs-index candidates: new doc is always d1
            sets = doc_sets
            if os.path.isdir(bands_dir):
                idx = spark.read.parquet(bands_dir).dropDuplicates(
                    ["band_idx", "bh", "doc_id"]
                )
                cross = (
                    new_bands.alias("n")
                    .join(
                        idx.alias("i"),
                        (F.col("n.band_idx") == F.col("i.band_idx"))
                        & (F.col("n.bh") == F.col("i.bh"))
                        & (F.col("n.doc_id") != F.col("i.doc_id")),
                    )
                    .select(
                        F.col("n.doc_id").alias("d1"), F.col("i.doc_id").alias("d2")
                    )
                )
                cand = intra.unionByName(cross).distinct()
                old_sets = spark.read.parquet(shsets_dir).dropDuplicates(["doc_id"])
                sets = doc_sets.unionByName(old_sets).dropDuplicates(["doc_id"])
            else:
                cand = intra.distinct()
            pairs = _verify_pairs(cand, sets, threshold_num, threshold_den)
            pairs.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
                pairs_dir
            )
            new_bands.write.mode("append").parquet(bands_dir)
            doc_sets.write.mode("append").parquet(shsets_dir)
        finally:
            doc_sets.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def read_dedup_pairs(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Verified pairs, deduplicated across epoch retries (at-least-once
    appends → exactly-once read)."""
    pairs_dir = os.path.join(index_path, "pairs")
    if not os.path.isdir(pairs_dir):
        return None
    return spark.read.parquet(pairs_dir).dropDuplicates(["d1", "d2"])
