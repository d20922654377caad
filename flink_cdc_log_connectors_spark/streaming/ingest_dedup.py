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

Index layout (under ``index_path``) — three append-managed
:class:`~.statetable.PartitionedStateTable`\\ s (r8-late; previously raw
``mode("append")`` parquet dirs, which accumulated one file set per
epoch FOREVER with no commit protocol — the same unwired-bookkeeping
class the state tables and the exactly-once sink already fixed):

- ``bands/``  — (doc_id, band_idx, bh) + the append's ``__epoch`` stamp;
- ``shsets/`` — (doc_id, shset) + ``__epoch``;
- ``pairs/``  — (d1, d2, jaccard) + ``__epoch``.

Each batch commits through ``append()`` (O(batch) write, atomic manifest
swap; a RETRIED epoch overwrites its own version — idempotent by
construction, no read-side dedup needed) and ``maybe_compact()`` bounds
every bucket's version-file count at ``compact_threshold`` (LSM-style
fold under a fresh counter-drawn id; row ``__epoch`` stamps survive
compaction, so the replay discipline below is compaction-transparent).
Old raw-layout index dirs are not readable by this version — re-ingest
to migrate.

Epoch replay discipline: the new-vs-index join reads only index rows
with ``__epoch < epoch_id`` (r8) — a retried epoch therefore sees
exactly the index the original delivery saw and re-derives the SAME
oriented pairs (its own first-delivery rows are invisible; pre-fix, the
retry joined its own rows through the index and emitted every
intra-batch pair in BOTH orientations).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hashed_word_ngrams
from ..operators.dedup import BANDS, ROWS_PER_BAND, _band_bucket, minhash_signatures
from .statetable import PartitionedStateTable


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
        n_buckets: int = 16,
        compact_threshold: int = 16,
    ) -> None:
        self.n = n
        self.threshold_num = threshold_num
        self.threshold_den = threshold_den
        self.text_col = text_col
        self.id_col = id_col
        #: bound on any index bucket's version-file count — exceeded →
        #: that table folds to one version (amortized O(1/threshold)
        #: per commit, the LSM trade the other state tables make)
        self.compact_threshold = compact_threshold
        self.bands = PartitionedStateTable(
            os.path.join(index_path, "bands"), ["doc_id"], n_buckets=n_buckets
        )
        self.shsets = PartitionedStateTable(
            os.path.join(index_path, "shsets"), ["doc_id"], n_buckets=n_buckets
        )
        self.pairs = PartitionedStateTable(
            os.path.join(index_path, "pairs"), ["d1", "d2"], n_buckets=n_buckets
        )

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
            idx_all = self.bands.read(spark)
            if idx_all is not None:
                # Broadcast semi-join prefilter BEFORE the candidate
                # join: the batch's distinct (band_idx, bh) keys are
                # batch-bounded, so the accumulated index is filtered
                # MAP-SIDE at the scan and only band groups the batch
                # actually collides with ever enter a shuffle — without
                # it, per-batch shuffle grows with corpus size, the same
                # O(state) failure class the IVM consumers' bucket
                # pruning removes.
                probe_keys = new_bands.select("band_idx", "bh").distinct()
                idx = idx_all.filter(F.col("__epoch") < epoch_id).join(
                    F.broadcast(probe_keys),
                    ["band_idx", "bh"],
                    "leftsemi",
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
                    self.shsets.read(spark)
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
            # pairs FIRST (its plan reads the pre-append band manifest);
            # a crash between appends retries the epoch and every append
            # idempotently overwrites its own version — convergent
            self.pairs.append(pairs, epoch_id=epoch_id)
            self.bands.append(new_bands, epoch_id=epoch_id)
            self.shsets.append(doc_sets, epoch_id=epoch_id)
            for t in (self.pairs, self.bands, self.shsets):
                t.maybe_compact(spark, self.compact_threshold)
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
    n_buckets: int = 16,
    compact_threshold: int = 16,
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
        n_buckets=n_buckets,
        compact_threshold=compact_threshold,
    )
    return (
        stream.writeStream.foreachBatch(dd.process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def read_dedup_pairs(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Verified pairs.  Exactly-once by the commit protocol itself — a
    retried epoch's ``append`` replaces its own version, so no read-side
    dedup is needed."""
    df = PartitionedStateTable(
        os.path.join(index_path, "pairs"), ["d1", "d2"]
    ).read(spark)
    return None if df is None else df.select("d1", "d2", "jaccard")
