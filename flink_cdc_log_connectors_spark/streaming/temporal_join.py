"""Event-time temporal table join over CDC streams (Flink's
``JOIN dim FOR SYSTEM_TIME AS OF fact.rowtime``).

The reference's flagship SQL pattern: an append-only fact stream joined
against a CDC-fed VERSIONED dimension, each fact enriched with the dim row
that was valid AT THE FACT'S EVENT TIME — not the dim's latest state (that
is ``streaming/joins.py``).  Prices at order time, customer tier at click
time, exchange rate at trade time.

Semantics implemented (matching Flink's event-time temporal join):

- the dim's change log builds a version history: each change opens a
  version at its source timestamp (``_src.op_ts_ms``); a delete closes the
  key (facts after the delete and before a re-insert match nothing);
- a fact joins the LATEST dim version with ``valid_ms <= fact.ts_ms``
  (same-millisecond dim changes are visible, offset order breaking ties);
- facts are BUFFERED until the dim watermark (max dim/heartbeat source ts
  seen) passes STRICTLY beyond their event time — a fact is only emitted
  once no version at-or-before its rowtime can still arrive (source
  timestamps are non-decreasing in offset order, so completeness is only
  guaranteed strictly below the max seen ts: a same-ms dim change may
  still follow in a later microbatch), making results immune to
  cross-stream arrival skew AND to batch boundaries splitting a same-ms
  tie group;  once emitted, a verdict is final.

Mechanics per microbatch (foreachBatch):

1. append this batch's dim changes to the bucketed version-history state
   (keyed by (dim key, log offset) — replay upserts the same rows:
   idempotent);  heartbeats (op='h') advance the watermark only.
2. add this batch's facts to the pending buffer;
3. emit every pending fact whose ts < watermark: hash-join on the dim
   key against history, keep versions at-or-before the fact, rank to the
   latest, tombstone the emitted keys out of the buffer, upsert results
   into the output view (atomic manifest swap).

Scale: history and output are :class:`PartitionedStateTable`s — per-batch
work prunes to touched key buckets.  The history is APPEND-managed and
bucketed by the dim key alone (r7), so the emit join reads ONLY the
history buckets this batch's ready facts probe (collected in the same
agg job that counts them) instead of the full table.  The pending buffer
holds only facts AHEAD of the dim watermark (steady state: one watermark
lag's worth); the emit join's per-row cost is bounded by the per-key
version count, the same bound Flink's temporal-join state carries
(``compact()`` bounds the history's file counts).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.debezium import parse_change_rows, parse_debezium
from .joins import JoinSide
from .statetable import PartitionedStateTable

_OFF_COLS = ["_vfile", "_vpos", "_vimg"]


class TemporalJoin:
    """State + emit machinery behind :func:`materialize_temporal_join`."""

    def __init__(
        self,
        fact: JoinSide,
        dim: JoinSide,
        output_path: str,
        how: str = "inner",
        dim_prefix: str = "d_",
        n_buckets: int = 64,
        history_compact_threshold: int = 16,
        history_retention_ms: int | None = None,
    ) -> None:
        if how not in ("inner", "left"):
            raise ValueError(f"how must be inner|left, got {how!r}")
        # the emit join prunes history reads by hashing the FACT's join
        # column with the HISTORY's bucket hash — xxhash64 equality needs
        # type equality, so a type mismatch would silently prune the
        # WRONG buckets (missing matches), not error.  Refuse up front.
        fact_jt = {f.name: f.dataType for f in fact.physical.fields}[
            fact.join_col
        ]
        dim_kt = {f.name: f.dataType for f in dim.physical.fields}[dim.key]
        if fact_jt != dim_kt:
            raise ValueError(
                f"fact.join_col {fact.join_col!r} ({fact_jt.simpleString()})"
                f" and dim.key {dim.key!r} ({dim_kt.simpleString()}) must "
                "have the same type: history-bucket pruning hashes the "
                "fact join column with the dim key's bucket hash"
            )
        self.fact = fact
        self.dim = dim
        self.how = how
        self.dim_prefix = dim_prefix
        self.output_path = output_path
        # one row per dim VERSION, append-only; BUCKETED BY THE DIM KEY
        # ALONE (r7) — append() never merges, so the bucket hash is pure
        # placement, and keying it by the join column lets the emit read
        # ONLY the history buckets this batch's facts probe (hashing in
        # the offset columns spread each key across every bucket, forcing
        # a full-history read per emit — the real 100 TB cost).  Requires
        # fact.join_col and dim.key to share a type (hash equality).
        self.history = PartitionedStateTable(
            f"{output_path}/__dim_history",
            [dim.key],
            n_buckets=n_buckets,
        )
        self.pending = PartitionedStateTable(
            f"{output_path}/__pending", [fact.key], n_buckets=n_buckets
        )
        self.output = PartitionedStateTable(
            f"{output_path}/view", [fact.key], n_buckets=n_buckets
        )
        # Steady-state history compaction (VERDICT r7 What's-wrong #1):
        # append() accumulates one file set per (bucket, epoch) forever;
        # when any bucket's version list exceeds this threshold the next
        # process_batch folds the whole history into one version under a
        # collision-free counter id (maybe_compact).  0/None disables.
        # Amortized cost ≈ 1/threshold full-table rewrites per commit;
        # read cost between compactions ≤ threshold files per probed
        # bucket — the LSM trade the reference's state backend makes at
        # checkpoint time.
        self.history_compact_threshold = history_compact_threshold
        #: compactions fired by this instance (witness/test observable)
        self.history_compactions = 0
        #: event-time RETENTION for the version history (None = keep
        #: everything, the original behavior).  With a value L, each
        #: history compaction also expires versions SUPERSEDED by a
        #: same-key version at or before ``watermark - L`` (per key, the
        #: reigning version at the cutoff — even a delete — survives, so
        #: every fact with rowtime ≥ wm - L still joins exactly what it
        #: would have).  This is the declared-lateness trade Flink's
        #: ``table.exec.state.ttl`` makes for the same join (the
        #: reference's connectors feed Flink, whose runtime owns this
        #: knob — here the engine does): without it, dim history is
        #: O(all versions ever); with it, O(churn within the lateness
        #: window) — the difference between corpus-lifetime and
        #: steady-state storage at 100 TB.  A fact arriving later than L
        #: below the watermark may join a pruned version's successor —
        #: that is the contract the caller declares by setting L.  GC
        #: piggybacks on compaction's existing read+write (zero extra
        #: IO, zero extra jobs per epoch).
        self.history_retention_ms = history_retention_ms

    # -- watermark persistence (atomic, replay-idempotent: monotone max) --
    def _wm_path(self) -> str:
        return os.path.join(self.output_path, "__watermark.json")

    def load_watermark(self) -> int | None:
        try:
            with open(self._wm_path()) as f:
                return json.load(f)["ts_ms"]
        except FileNotFoundError:
            return None

    def _store_watermark(self, ts_ms: int) -> None:
        os.makedirs(self.output_path, exist_ok=True)
        tmp = self._wm_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"ts_ms": ts_ms}, f)
        os.replace(tmp, self._wm_path())

    # -- helpers ----------------------------------------------------------
    def _dim_out_cols(self) -> list[str]:
        return [f"{self.dim_prefix}{f.name}" for f in self.dim.physical.fields]

    def process_batch(self, raw_batch: DataFrame, epoch_id: int) -> None:
        spark = raw_batch.sparkSession
        table_of = F.get_json_object(F.col("value"), "$.source.table")

        # ---- dim side: versions + watermark -----------------------------
        # parse + UPDATE_BEFORE retraction fused into the parse's own
        # projections with memoized trees (r13).
        # UPDATE_BEFORE semantics (r6): the update's before-image becomes
        # an explicit CLOSING version of ITS key ('d' at the update's ts).
        # For key-stable updates it is shadowed at join time (the rank
        # orders _vimg desc within an offset, so the after-image wins);
        # for PK-CHANGING updates it is what retracts the old key —
        # previously the before-image was dropped and a renamed dim key
        # kept matching facts forever.  Heartbeats (still present here,
        # filtered below) advance the watermark but store nothing.
        # lazy persist: the stats agg below is the materializing job —
        # an eager localCheckpoint would spend one extra job per batch
        # (r7: per-batch driver actions are the dominant fixed cost of
        # the foreachBatch deployment — see NOTES_r7)
        from ..functions.prepared import prepared

        dim_sel = prepared(
            ("tj_dim_sel", self.dim.physical.json()),
            lambda: [
                *[F.col(f.name) for f in self.dim.physical.fields],
                F.col("op").alias("_vop"),
                F.col("_src.op_ts_ms").alias("_valid_ms"),
                F.coalesce(F.col("_src.file"), F.lit("")).alias("_vfile"),
                F.coalesce(F.col("_src.pos"), F.lit(-1)).alias("_vpos"),
                F.coalesce(F.col("_src.img_seq"), F.lit(-1)).alias("_vimg"),
            ],
        )
        dim_all = (
            parse_change_rows(
                raw_batch.filter(table_of == self.dim.table),
                self.dim.physical,
                offsets=False,
            )
            .select(*dim_sel)
            .persist()
        )
        # ---- fact side parse (needed for the fused stats agg below) -----
        # 'r' (snapshot-read) facts carry the engine's epoch-0 snapshot
        # rowtime, so they join dim versions as of time 0 — i.e. none.
        # This mirrors Flink's stance (a snapshot row has no meaningful
        # event time for a temporal join); feed the fact side from the
        # log phase, or pre-stamp snapshot rows with a chosen rowtime.
        fact_parsed = parse_debezium(
            raw_batch.filter(table_of == self.fact.table), self.fact.physical
        )
        fact_cols = [f.name for f in self.fact.physical.fields]
        fact_sel = prepared(
            ("tj_fact_sel", self.fact.physical.json()),
            lambda: (
                F.col("op").isin("c", "r"),
                [
                    *[F.col(c) for c in fact_cols],
                    F.col("_src.op_ts_ms").alias("_fact_ms"),
                ],
            ),
        )
        facts = (
            fact_parsed.filter(fact_sel[0]).select(*fact_sel[1]).persist()
        )

        # ONE driver round-trip for ALL per-batch input scalars (r8; r7
        # had a dim-only stats agg plus a touched-bucket collect inside
        # EACH state-table upsert — the per-epoch job count, not shuffle
        # width, is the dominant fixed cost of a foreachBatch deployment):
        # the union agg materializes both persists, computes the dim
        # watermark stats AND collects the pending-table buckets this
        # batch's facts hash to (bounded by n_buckets), which
        # pending.upsert below takes precomputed.
        def _build_stats():
            is_hb = F.col("_vop") == "h"
            is_dim = (~is_hb) & (F.col("_vop") != "__fact")
            dcols = [
                F.col("_vop"),
                F.col("_valid_ms"),
                F.lit(None).cast("int").alias("__pb"),
            ]
            fcols = [
                F.lit("__fact").alias("_vop"),
                F.lit(None).cast("long").alias("_valid_ms"),
                self.pending.bucket_for(F.col(self.fact.key)).alias("__pb"),
            ]
            aggs = [
                F.max(F.when(is_hb, F.col("_valid_ms"))).alias("hb_max"),
                F.max(F.when(is_dim, F.col("_valid_ms"))).alias("dim_max"),
                F.count(F.when(is_dim, F.lit(1))).alias("n_dim"),
                F.count(F.when(F.col("_vop") == "__fact", F.lit(1))).alias(
                    "n_fact"
                ),
                F.collect_set("__pb").alias("fact_pb"),
            ]
            return dcols, fcols, aggs

        dcols, fcols, aggs = prepared(
            (
                "tj_stats",
                self.fact.physical.json(),
                self.fact.key,
                self.pending.n_buckets,
            ),
            _build_stats,
        )
        probe = dim_all.select(*dcols).unionByName(facts.select(*fcols))
        stats = probe.agg(*aggs).first()
        if stats["n_dim"] > 0:
            # version history is INSERT-ONLY (keyed by dim key + offset,
            # rows never change) — append-only commit: one O(batch) write,
            # no touched-bucket collect, no prior-bucket rewrite (r7; an
            # upsert rewrote every touched bucket's FULL history per batch)
            self.history.append(
                dim_all.filter(F.col("_vop") != "h"),
                epoch_id=epoch_id,
                batch_rows=stats["n_dim"],
            )
            # steady-state compaction policy (r8): fold the history's
            # accumulated version files when any bucket's list exceeds
            # the threshold — see __init__; the id comes from the
            # manifest's own counter, never this epoch, so a retry of
            # this epoch can't collide with the compacted version
            if self.history_compact_threshold and self.history.maybe_compact(
                spark,
                self.history_compact_threshold,
                transform=self._retention_transform(),
            ):
                self.history_compactions += 1
        wm = self.load_watermark()
        for cand in (stats["dim_max"], stats["hb_max"]):
            if cand is not None and (wm is None or cand > wm):
                wm = cand
        if wm is not None:
            self._store_watermark(wm)
        # stored buffer ∪ this batch's facts (a replayed batch's facts may
        # be in both — key dedup).  The buffer is written ONCE per batch
        # below: new still-pending facts in, emitted keys tombstoned out.
        buffered = self.pending.read(spark)
        all_facts = facts
        if buffered is not None:
            all_facts = (
                buffered.select(*fact_cols, "_fact_ms")
                .unionByName(facts)
                .dropDuplicates([self.fact.key])
            )

        # STRICT bound: source timestamps are non-decreasing in offset
        # order, so having SEEN ts only proves entries with ts' < ts are
        # complete — another same-ms dim change may still arrive in a
        # later microbatch (ms-resolution logs tie constantly, and a
        # batch boundary can split the tie group).  Emitting at
        # `_fact_ms == wm` therefore risks a premature final verdict
        # pinning the earlier same-ms version; `<` is the exact
        # completeness the max-seen watermark can assert.  (Flink emits
        # at == because ITS source watermark carries a "no more ≤ t"
        # contract; a max-seen watermark does not.)  Tail facts at the
        # high-water mark flush when heartbeats advance wm past them —
        # the reference's heartbeat feature exists for exactly this —
        # or explicitly via :meth:`flush_tail` on bounded logs.
        has_ready = False
        ready = None
        hist_buckets: list[int] = []
        ready_pb: list[int] = []
        if wm is not None:
            # lazy persist + ONE agg job: materializes the cache, counts,
            # AND collects both bucket sets the ready facts touch — the
            # history buckets the emit join probes and the pending
            # buckets the tombstones below hash to (each bounded by
            # n_buckets) — so neither downstream upsert needs its own
            # collect job
            ready = all_facts.filter(F.col("_fact_ms") < F.lit(wm)).persist()
            rstats = ready.agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set(
                    self.history.bucket_for(F.col(self.fact.join_col))
                ).alias("bks"),
                F.collect_set(
                    self.pending.bucket_for(F.col(self.fact.key))
                ).alias("pbs"),
            ).first()
            has_ready = rstats["n"] > 0
            hist_buckets = sorted(rstats["bks"])
            ready_pb = list(rstats["pbs"])
        # EMIT BEFORE the pending tombstone commit (ADVICE r7): the
        # output upsert is keyed and idempotent, so a crash between the
        # two leaves the emitted facts still pending and the retry
        # re-emits them identically; the old order (tombstone first)
        # permanently lost every buffered fact if the crash landed
        # between the commits — and it also kept `ready`'s lineage (over
        # the PRE-upsert pending files) alive past the upsert's GC.
        if has_ready:
            self._emit(
                spark, ready, fact_cols, epoch_id, hist_buckets, ready_pb
            )
        pending_rows = facts.withColumn("op", F.lit("c")).withColumn(
            "__seq", F.lit(0)
        )
        if has_ready:
            pending_rows = pending_rows.unionByName(
                ready.withColumn("op", F.lit("d")).withColumn("__seq", F.lit(1))
            )
        # touched precomputed (this batch's fact buckets ∪ the emitted
        # tombstones' buckets) — upsert skips its own collect; it still
        # no-ops when both are empty
        self.pending.upsert(
            pending_rows,
            order_by=["__seq"],
            epoch_id=epoch_id,
            touched=[*stats["fact_pb"], *ready_pb],
            batch_rows=stats["n_fact"],
        )
        dim_all.unpersist(False)
        facts.unpersist(False)
        if ready is not None:
            ready.unpersist(False)

    def _retention_transform(self):
        """Row-GC hook for the history compaction (see
        ``history_retention_ms``): drop versions superseded by a same-key
        version at or before ``watermark - retention``.  Per key the rank
        keeps the latest version at-or-below the cutoff (ordered exactly
        as the emit join ranks — valid_ms then offset columns — so the
        survivor IS the version any in-retention fact would pick) plus
        everything newer.  Returns None (compaction stays a pure
        re-layout) when retention is off or no watermark exists yet."""
        if self.history_retention_ms is None:
            return None
        wm = self.load_watermark()
        if wm is None:
            return None
        cutoff = wm - self.history_retention_ms

        def prune(df: DataFrame) -> DataFrame:
            fresh = df.filter(F.col("_valid_ms") > F.lit(cutoff))
            w = Window.partitionBy(self.dim.key).orderBy(
                F.col("_valid_ms").desc(),
                F.col("_vfile").desc(),
                F.col("_vpos").desc(),
                F.col("_vimg").desc(),
            )
            reigning = (
                df.filter(F.col("_valid_ms") <= F.lit(cutoff))
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            return fresh.unionByName(reigning)

        return prune

    def _emit(
        self,
        spark: SparkSession,
        ready: DataFrame,
        fact_cols: list[str],
        epoch_id: int,
        hist_buckets: list[int],
        out_touched: list[int] | None = None,
    ) -> None:
        """Join ``ready`` facts against the version history — reading
        ONLY the key-buckets the ready facts probe — rank to the latest
        version at-or-before each fact's rowtime, and upsert the final
        verdicts into the output view.  ``out_touched``: the output
        buckets the ready facts hash to (the output table shares the
        pending table's key and bucket count, so the caller's collected
        pending-bucket set is a valid superset — emitted rows are a
        subset of ready), letting the upsert skip its own collect job."""
        from ..functions.prepared import prepared

        dim_cols = [f.name for f in self.dim.physical.fields]
        hist = (
            self.history.read_buckets(spark, hist_buckets)
            if hist_buckets
            else None
        )
        prep_key = (
            "tj_emit",
            self.dim.physical.json(),
            self.dim.key,
            self.dim_prefix,
            self.fact.key,
            self.fact.join_col,
            tuple(fact_cols),
            self.how,
        )
        if hist is not None:
            dk = f"{self.dim_prefix}{self.dim.key}"

            def _build_emit():
                # history side in ONE prefixed projection (was a
                # withColumnRenamed per dim column + a select — r13)
                hist_sel = [
                    F.col(self.dim.key).alias(dk),
                    *[
                        F.col(c).alias(f"{self.dim_prefix}{c}")
                        for c in dim_cols
                        if c != self.dim.key
                    ],
                    F.col("_vop"),
                    F.col("_valid_ms"),
                    *[F.col(c) for c in _OFF_COLS],
                ]
                cond = (F.col(self.fact.join_col) == F.col(dk)) & (
                    F.col("_valid_ms") <= F.col("_fact_ms")
                )
                w_rank = Window.partitionBy(self.fact.key).orderBy(
                    F.col("_valid_ms").desc_nulls_last(),
                    F.col("_vfile").desc_nulls_last(),
                    F.col("_vpos").desc_nulls_last(),
                    F.col("_vimg").desc_nulls_last(),
                )
                rn = F.row_number().over(w_rank)
                # a delete version = no value at fact time
                live = F.col("_vop").isNotNull() & (F.col("_vop") != "d")
                out_cols = [
                    *[F.col(c) for c in fact_cols],
                    F.col("_fact_ms").alias("fact_ts_ms"),
                    *[
                        F.when(live, F.col(f"{self.dim_prefix}{c}")).alias(
                            f"{self.dim_prefix}{c}"
                        )
                        for c in dim_cols
                    ],
                ]
                return hist_sel, cond, rn, live, out_cols

            hist_sel, cond, rn, live, out_cols = prepared(
                prep_key, _build_emit
            )
            cand = ready.select(*fact_cols, "_fact_ms").join(
                hist.select(*hist_sel), cond, "left"
            )
            picked = cand.withColumn("__rn", rn).filter(F.col("__rn") == 1)
            if self.how == "inner":
                # on live rows when(live, pc) == pc; the filter makes the
                # projection identical to the pre-r13 masked columns
                emit = picked.filter(live).select(*out_cols)
            else:
                emit = picked.select(*out_cols)
        else:

            def _build_emit_none():
                return [
                    *[F.col(c) for c in fact_cols],
                    F.col("_fact_ms").alias("fact_ts_ms"),
                    *[
                        F.lit(None).cast(f_.dataType).alias(
                            f"{self.dim_prefix}{f_.name}"
                        )
                        for f_ in self.dim.physical.fields
                    ],
                ]

            null_cols = prepared((*prep_key, "none"), _build_emit_none)
            if self.how == "inner":
                # no history ⇒ nothing matches ⇒ inner emits nothing
                emit = ready.select(*null_cols).limit(0)
            else:
                emit = ready.select(*null_cols)
        self.output.upsert(
            emit.withColumn("op", F.lit("c")).withColumn("__seq", F.lit(0)),
            order_by=["__seq"],
            epoch_id=epoch_id,
            touched=out_touched,
        )

    def flush_tail(self, spark: SparkSession, epoch_id: int) -> None:
        """End-of-log flush: emit every still-pending fact against the
        version history as it stands — the explicit alternative to a
        trailing heartbeat for BOUNDED logs and heartbeat-less sources
        (VERDICT r6 What's-wrong #3: under the strict emit bound, facts
        at the high-water timestamp otherwise stay buffered until a
        heartbeat advances the watermark past them).

        Only call when the dim log is KNOWN complete up to the pending
        facts' rowtimes (end of a bounded replay; source drained): the
        emitted verdicts are final, and this waives the watermark's
        same-millisecond completeness guarantee that normally defers
        them.  The stored watermark is left untouched — a later
        process_batch resumes normal strict-bound semantics.

        ``epoch_id`` must be FRESH — not one a previous process_batch or
        flush_tail committed (the natural choice is last epoch + 1): the
        state tables refuse a reused id whose committed buckets this
        call doesn't touch (the static overwrite of ``v=<epoch>`` would
        clobber them).  Crash-safe in the ADVICE r7 ordering: the output
        emit (keyed, idempotent) commits FIRST, the pending tombstones
        after — a crash between them leaves the facts still buffered
        and a same-``epoch_id`` retry re-emits identically; the old
        order (tombstone first) permanently lost every buffered fact."""
        buffered = self.pending.read(spark)
        if buffered is None:
            return
        fact_cols = [f.name for f in self.fact.physical.fields]
        ready = buffered.select(*fact_cols, "_fact_ms").persist()
        try:
            rstats = ready.agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set(
                    self.history.bucket_for(F.col(self.fact.join_col))
                ).alias("bks"),
                F.collect_set(
                    self.pending.bucket_for(F.col(self.fact.key))
                ).alias("pbs"),
            ).first()
            if rstats["n"] == 0:
                return
            pbs = list(rstats["pbs"])
            self._emit(
                spark, ready, fact_cols, epoch_id, sorted(rstats["bks"]), pbs
            )
            self.pending.upsert(
                ready.withColumn("op", F.lit("d")).withColumn(
                    "__seq", F.lit(0)
                ),
                order_by=["__seq"],
                epoch_id=epoch_id,
                touched=pbs,
                batch_rows=rstats["n"],
            )
        finally:
            ready.unpersist(False)

    def read_view(self, spark: SparkSession) -> DataFrame | None:
        df = self.output.read(spark)
        if df is None:
            return None
        keep = [f.name for f in self.fact.physical.fields] + [
            "fact_ts_ms",
            *self._dim_out_cols(),
        ]
        return df.select(*keep)


def materialize_temporal_join(
    raw_stream: DataFrame,
    fact: JoinSide,
    dim: JoinSide,
    output_path: str,
    checkpoint_path: str,
    how: str = "inner",
    n_buckets: int = 64,
    history_compact_threshold: int = 16,
    history_retention_ms: int | None = None,
):
    """Continuously-maintained event-time temporal join over a raw CDC
    stream carrying both tables' envelopes.  Returns the
    ``DataStreamWriter``; read results via ``TemporalJoin(...).read_view``.
    """
    tj = TemporalJoin(
        fact,
        dim,
        output_path,
        how=how,
        n_buckets=n_buckets,
        history_compact_threshold=history_compact_threshold,
        history_retention_ms=history_retention_ms,
    )
    return (
        raw_stream.writeStream.foreachBatch(tj.process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
