"""Streaming ingestion dedup: minhash-LSH a document stream against the
ACCUMULATED corpus index — the training-pipeline pattern where new data
must be deduped against everything already ingested, not just its own
microbatch.

Per microbatch (``foreachBatch`` → :meth:`IngestDedup.process_batch`):

1. shingle + sign the batch with the SAME md5-60 / universal-hash
   machinery as the batch operators (``operators.dedup``);
2. candidate pairs = new-vs-index band-bucket join ∪ new-vs-new
   band self-join — the batch never joins the full corpus, only its
   band-bucket collisions;
3. exact Jaccard verification over stored shingle sets;
4. verified pairs append to ``pairs/``; the batch's bands + shingle
   sets append to the index, stamped with the epoch.

Index layout (under ``index_path``):

- ``bands/``  — (band_idx, bh, doc_id, epoch) parquet, appended per batch;
- ``shsets/`` — (doc_id, shset, epoch) parquet, appended per batch.

At 100 TB the band table is the only thing the stream joins against;
stored bucketed by ``bh`` it is a bucket-local join.  Epoch replay
discipline: the new-vs-index join reads only index rows with
``epoch < epoch_id`` (r8) — a retried epoch therefore sees exactly the
index the original delivery saw, re-derives the SAME oriented pairs
(its own first-delivery rows are invisible; pre-fix, the retry joined
its own rows through the index and emitted every intra-batch pair in
BOTH orientations), and its re-appended index/pairs rows deduplicate on
read (``dropDuplicates`` on doc/pair keys) — at-least-once appends,
exactly-once reads.
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


class IngestDedup:
    """The per-batch machinery behind :func:`streaming_minhash_dedup`,
    exposed as a class so a deterministic batch replay (the
    ``ingest_dedup_replay`` driver witness) can drive the REAL loop —
    same structure as ``TemporalJoin`` / ``ChangelogJoin``."""

    def __init__(
        self,
        index_path: str,
        n: int = 3,
        threshold_num: int = 1,
        threshold_den: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.n = n
        self.threshold_num = threshold_num
        self.threshold_den = threshold_den
        self.text_col = text_col
        self.id_col = id_col
        self.bands_dir = os.path.join(index_path, "bands")
        self.shsets_dir = os.path.join(index_path, "shsets")
        self.pairs_dir = os.path.join(index_path, "pairs")

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        doc_sets = batch.select(
            F.col(self.id_col).alias("doc_id"),
            hashed_word_ngrams(F.col(self.text_col), self.n).alias("shset"),
        ).persist()
        try:
            new_bands = _batch_bands(doc_sets).persist()
            # new-vs-new candidates (within the batch): smaller id first
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
            # new-vs-index candidates: new doc is always d1.  The index
            # read is epoch-FILTERED so a retried epoch joins exactly the
            # index its first delivery saw (never its own re-appended
            # rows — which would emit intra pairs in both orientations)
            sets = doc_sets
            if os.path.isdir(self.bands_dir):
                # Broadcast semi-join prefilter BEFORE the retry-dedup and
                # the candidate join: the batch's distinct (band_idx, bh)
                # keys are batch-bounded, so the accumulated index is
                # filtered MAP-SIDE at the scan and only band groups the
                # batch actually collides with ever enter a shuffle.
                # Without it the dropDuplicates below re-shuffles the
                # ENTIRE index every microbatch — per-batch cost growing
                # with corpus size, the same O(state) failure class the
                # IVM consumers' bucket pruning removes.
                probe_keys = new_bands.select("band_idx", "bh").distinct()
                idx = (
                    spark.read.parquet(self.bands_dir)
                    .filter(F.col("epoch") < epoch_id)
                    .join(
                        F.broadcast(probe_keys),
                        ["band_idx", "bh"],
                        "leftsemi",
                    )
                    .dropDuplicates(["band_idx", "bh", "doc_id"])
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
                # same prefilter for the shingle-set store: verification
                # only needs the candidate partners' sets (d2 is the only
                # side that can be an index doc), not every document ever
                # ingested.  Broadcasting the candidate ids recomputes the
                # cand subtree once for the hash table — batch-scale work,
                # against shuffling the whole store.
                needed = cand.select(F.col("d2").alias("doc_id")).distinct()
                old_sets = (
                    spark.read.parquet(self.shsets_dir)
                    .select("doc_id", "shset")
                    .join(F.broadcast(needed), ["doc_id"], "leftsemi")
                    .dropDuplicates(["doc_id"])
                )
                sets = doc_sets.unionByName(old_sets).dropDuplicates(["doc_id"])
            else:
                cand = intra.distinct()
            pairs = _verify_pairs(
                cand, sets, self.threshold_num, self.threshold_den
            )
            pairs.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(self.pairs_dir)
            new_bands.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(self.bands_dir)
            doc_sets.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(self.shsets_dir)
        finally:
            doc_sets.unpersist()


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
    dd = IngestDedup(
        index_path,
        n=n,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        text_col=text_col,
        id_col=id_col,
    )
    return (
        stream.writeStream.foreachBatch(dd.process_batch)
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
