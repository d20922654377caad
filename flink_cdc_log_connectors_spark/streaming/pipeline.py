"""Structured-Streaming pipeline over the cdclog source.

End-to-end: ``read_cdc_stream`` (source + JVM-side envelope parse) →
changelog-aware transforms (dedup filter, windows, watermarks) →
materialization sinks (``foreachBatch`` upsert ≈ the reference users'
Flink-SQL sink + the P7 merge generalized to a table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.datasource import register
from ..sources.debezium import parse_debezium
from .statetable import PartitionedStateTable


def read_cdc_stream(
    spark: SparkSession,
    path: str,
    physical: T.StructType,
    snapshot_path: str | None = None,
    starting_offsets: str = "initial",
    max_lines_per_batch: int = 10_000,
) -> DataFrame:
    """Streaming change-row DataFrame in the fork's append+op shape."""
    register(spark)
    raw = (
        spark.readStream.format("cdclog")
        .option("path", path)
        .option("startingOffsets", starting_offsets)
        .option("maxLinesPerBatch", str(max_lines_per_batch))
    )
    if snapshot_path:
        raw = raw.option("snapshotPath", snapshot_path)
    return parse_debezium(raw.load(), physical)


def read_cdc_batch(
    spark: SparkSession,
    path: str,
    physical: T.StructType,
    snapshot_path: str | None = None,
) -> DataFrame:
    """Bounded read of snapshot + full log (backfill / testing path)."""
    register(spark)
    raw = spark.read.format("cdclog").option("path", path)
    if snapshot_path:
        raw = raw.option("snapshotPath", snapshot_path)
    return parse_debezium(raw.load(), physical)


def should_emit_filter(
    stream: DataFrame,
    finished_chunks: DataFrame,
    key_col: str,
) -> DataFrame:
    """The reference's L2 de-duplicating emit filter
    (``BinlogSplitReader.shouldEmit:194-240``): during/after the hybrid
    snapshot, a log event is emitted only if

    - its key lies outside every finished chunk range, or
    - its offset is PAST the high watermark recorded for its chunk

    (otherwise the chunk merge P7 already accounted for it).
    ``finished_chunks`` is tiny (one row per chunk: ``chunk_start``,
    ``chunk_end``, ``hw_file``, ``hw_pos``) → broadcast join, no shuffle
    of the stream.
    """
    fc = F.broadcast(finished_chunks)
    key = F.col(f"s.{key_col}")
    in_chunk = (
        (F.col("c.chunk_start").isNull() | (key >= F.col("c.chunk_start")))
        & (F.col("c.chunk_end").isNull() | (key < F.col("c.chunk_end")))
    )
    joined = stream.alias("s").join(fc.alias("c"), in_chunk, "left")
    past_watermark = (
        F.col("c.chunk_start").isNull()  # no chunk covers the key
        | (F.col("s._src.file") > F.col("c.hw_file"))
        | (
            (F.col("s._src.file") == F.col("c.hw_file"))
            & (F.col("s._src.pos") > F.col("c.hw_pos"))
        )
    )
    return joined.filter(past_watermark).select("s.*")


def materialize_changelog(
    stream: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    output_path: str,
    checkpoint_path: str,
    op_col: str = "op",
    n_buckets: int = 64,
):
    """``foreachBatch`` upsert materialization into a
    :class:`~..streaming.statetable.PartitionedStateTable`: each microbatch
    merges (last-write-wins / delete-drops-key) into ONLY the key-hash
    buckets it touches, committed by an atomic manifest swap — per-batch
    work is O(batch + touched buckets), not O(total state), and a crash
    mid-write leaves the previous state intact.  Read the result back with
    :func:`~.statetable.read_state`.  (With Delta/Iceberg installed, swap
    the body for MERGE INTO — identical semantics.)
    """
    table = PartitionedStateTable(output_path, list(keys), n_buckets=n_buckets)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        # UPDATE_BEFORE semantics for PK-changing updates: the before
        # image retracts its (old) key — without this a key-changing 'u'
        # leaves the old key live with stale values.  Key-stable updates
        # are unaffected (the after image out-ranks the before image at
        # the same offset either way).
        if op_col == "op" and "_src" in batch.columns:
            from ..sources.debezium import retract_before_images

            batch = retract_before_images(batch)
        table.upsert(batch, order_by=list(order_by), epoch_id=epoch_id, op_col=op_col)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation over the change
    stream (late data beyond the watermark is dropped — reference users get
    this from Flink SQL; here it's native Structured Streaming)."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_windows(
    stream: DataFrame,
    ts_col: str,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Session-window aggregation (dynamic-gap sessions close when no event
    arrives within ``gap``)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: name of the per-batch lag observation attached by ``with_lag_observer``
LAG_OBSERVATION = "cdc_lag"


def with_lag_observer(
    stream: DataFrame, src_col: str = "_src", name: str = LAG_OBSERVATION
) -> DataFrame:
    """Attach the per-batch observation feeding the reference's fetch/emit
    delay gauges (``SourceReaderMetrics.java:87`` currentFetchEventTimeLag
    / currentEmitEventTimeLag).  ``df.observe`` aggregates ride the batch
    for free (no extra pass); snapshot rows (op_ts epoch 0) are excluded —
    lag over a backfill row is meaningless and would dwarf the gauge."""
    op_ts = F.col(f"{src_col}.op_ts_ms")
    emit_ts = F.col(f"{src_col}.emit_ts_ms")
    live = op_ts > 0
    return stream.observe(
        name,
        F.max(F.when(live, op_ts)).alias("max_op_ts_ms"),
        # per-event pairing: connector-emit minus source-commit, maxed —
        # the reference's fetch lag (how stale events were when fetched)
        F.max(F.when(live, emit_ts - op_ts)).alias("max_fetch_delay_ms"),
        F.count(F.lit(1)).alias("rows"),
    )


def _iso_to_ms(ts: str | None) -> int | None:
    if not ts:
        return None
    from datetime import datetime, timezone

    t = datetime.fromisoformat(ts.replace("Z", "+00:00"))
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return int(t.timestamp() * 1000)


def progress_metrics(progress) -> dict:
    """C11 — source metrics from StreamingQueryProgress: rows/sec, batch
    duration, per-source offsets, and the reference's fetch/emit delay
    gauges (``SourceReaderMetrics.java:87``) derived from the
    ``with_lag_observer`` observation:

    - ``fetchDelayMs``: max over the batch of (connector emit ts − source
      commit ts) — how stale events were when the source fetched them.
    - ``emitDelayMs``: (batch end wall time − newest source commit ts) —
      event-time-to-downstream-emit lag of the batch.

    Accepts a live StreamingQuery, a StreamingQueryProgress, or a plain
    progress dict."""
    if isinstance(progress, dict):
        p = progress
    elif hasattr(progress, "lastProgress"):
        p = progress.lastProgress
    else:
        p = progress
    if p is not None and not isinstance(p, dict):
        import json as _json

        p = _json.loads(p.json)  # StreamingQueryProgress → plain dict
    if p is None:
        return {}
    out = {
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "durationMs": p.get("durationMs"),
        "sources": [
            {"description": s.get("description"), "endOffset": s.get("endOffset")}
            for s in p.get("sources", [])
        ],
    }
    obs = (p.get("observedMetrics") or {}).get(LAG_OBSERVATION) or {}
    if hasattr(obs, "asDict"):  # live progress carries observations as Rows
        obs = obs.asDict()
    fetch = obs.get("max_fetch_delay_ms")
    out["fetchDelayMs"] = int(fetch) if fetch is not None else None
    trigger_ms = _iso_to_ms(p.get("timestamp"))
    max_op = obs.get("max_op_ts_ms")
    if trigger_ms is not None and max_op is not None:
        exec_ms = (p.get("durationMs") or {}).get("triggerExecution") or 0
        out["emitDelayMs"] = trigger_ms + int(exec_ms) - int(max_op)
    else:
        out["emitDelayMs"] = None
    return out


def consumer_state_metrics(consumer) -> dict:
    """C11 — deterministic state-maintenance gauges for an IVM consumer
    (``ChangelogAggregate`` / ``ChangelogTopN`` / ``ChangelogJoin`` /
    continuous aggregate), the production twin of the axes the scale
    harness reads (VERDICT r10 #8).  Pair with :func:`progress_metrics`
    in a ``StreamingQueryListener`` or after each foreachBatch:

    - ``expiredApplied``: TTL retraction images applied so far by this
      consumer instance (cumulative; counted inside the fused per-batch
      stats agg — zero extra driver actions).
    - ``dimBucketsOpened``: how many dim-store buckets the last join
      enrichment actually read (``ChangelogJoin.last_dim_buckets``) —
      the bytes-opened pruning axis; ``None`` when the last read was a
      full dim read (type-mismatch fallback).  Key absent for
      consumers without a dim side.
    - ``watermark`` / ``pendingExpiryEpochs``: the TTL protocol's
      persisted event-time watermark and any staged-but-unfinalized
      expiry epochs (non-empty = a crashed pass awaiting the
      self-healing data path or idle ticker).

    Reads two tiny JSON files at most; no Spark jobs."""
    out: dict = {}
    if hasattr(consumer, "expired_applied"):
        out["expiredApplied"] = consumer.expired_applied
    if hasattr(consumer, "last_dim_buckets"):
        ldb = consumer.last_dim_buckets
        out["dimBucketsOpened"] = None if ldb is None else len(ldb)
    proto = getattr(consumer, "_ttl_proto", None)
    if proto is not None:
        out["watermark"] = proto.load_wm()
        out["pendingExpiryEpochs"] = proto.staged_epochs()
    return out


def state_metrics_listener(consumers: dict, publish):
    """The wiring VERDICT r11 #7 asked for: a ``StreamingQueryListener``
    that publishes :func:`progress_metrics` (per-batch source gauges)
    merged with :func:`consumer_state_metrics` (per-consumer state
    gauges) on every ``onQueryProgress``::

        agg = ChangelogAggregate(..., ttl=..., ttl_col="ets")
        spark.streams.addListener(
            state_metrics_listener({"orders_agg": agg}, emit_to_sink)
        )

    ``consumers`` maps a stable name → IVM consumer instance;
    ``publish`` receives one plain dict per progress event (ship it to
    whatever metrics sink the deployment uses).  Listener callbacks run
    on a background thread, and both metric readers stay no-Spark-job
    (JSON reads at most), so a slow sink is the only thing that can
    block the thread — keep ``publish`` non-blocking.
    ``pendingExpiryEpochs`` read concurrently with a running batch is
    advisory (the data path self-heals regardless); a publish failure
    is swallowed after one warning — metrics must never kill the
    stream."""
    import warnings

    from pyspark.sql.streaming import StreamingQueryListener

    class _StateMetricsListener(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            payload = {
                "query": progress_metrics(event.progress),
                "consumers": {
                    name: consumer_state_metrics(c)
                    for name, c in consumers.items()
                },
            }
            try:
                publish(payload)
            except Exception as e:  # noqa: BLE001 — see docstring
                warnings.warn(f"state_metrics_listener publish failed: {e}")

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            pass

    return _StateMetricsListener()


def dedup_stream(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful exactly-once dedup within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each microbatch of the change stream
    joins the (small) dimension snapshot.  The dimension side is broadcast
    — the stream is never shuffled, so at 100 TB/day of changes the plan
    stays map-only per microbatch.  (Reference users write
    ``SELECT ... FROM cdc_stream JOIN dim ON ...`` in Flink SQL —
    ``MySqlConnectorITCase.java:186`` pattern; this is the Spark-native
    equivalent.)"""
    return stream.join(F.broadcast(dim), list(keys), how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (Flink's interval join, the form the
    reference's users run between two CDC streams): match rows with equal
    ``key`` where ``right_ts ∈ [left_ts - lower, left_ts + upper]``.

    Both sides carry watermarks and the join condition bounds event time in
    BOTH directions, so Structured Streaming can expire join state — state
    size is O(rate × (lower+upper)), independent of stream length; without
    the time bound the state would grow forever.  The equi-key keeps the
    exchange a hash partition on ``key``.  ``how='leftOuter'`` etc. emit
    unmatched rows with NULLs after the watermark closes their window."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    # outer variants emit the unmatched side with NULLs once the
    # watermark proves no match can still arrive — supported because the
    # time bounds make join state finite
    return lw.join(rw, cond, how)


def fanout_by_table(
    stream: DataFrame,
    output_base: str,
    checkpoint_path: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    tables: Sequence[str] | None = None,
    src_col: str = "_src",
    n_buckets: int = 64,
):
    """Whole-database capture: ONE change stream carrying many tables
    (the reference's ``table-name`` regex surface — one source captures
    `tbl_\\d+`; ``MySqlSourceOptions.java:58-68``) materialized into one
    :class:`PartitionedStateTable` per table, in a single ``foreachBatch``
    pass.

    The alternative — one streaming query per table — re-reads and
    re-parses the log N times; here the batch is read once, split by the
    metadata table name, and each slice merged into
    ``{output_base}/{table}`` touching only the key-hash buckets the
    slice hits (per-batch work O(batch), not O(state)).  ``tables=None``
    discovers the batch's tables dynamically (a driver-side distinct over
    one microbatch — the per-batch table list, not the data, so O(tables)
    not O(rows)).
    """

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if "_src" in batch.columns:
            from ..sources.debezium import retract_before_images

            # UPDATE_BEFORE retraction for PK-changing updates (see
            # materialize_changelog)
            batch = retract_before_images(batch)
        batch = batch.persist()
        try:
            names = tables
            if names is None:
                names = [
                    r[0]
                    for r in batch.select(
                        F.col(f"{src_col}.table_name")
                    ).distinct().collect()
                ]
            for t in names:
                slice_ = batch.filter(F.col(f"{src_col}.table_name") == t)
                PartitionedStateTable(
                    f"{output_base}/{t}", list(keys), n_buckets=n_buckets
                ).upsert(slice_, order_by=list(order_by), epoch_id=epoch_id)
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def add_tables_backfill(
    spark: SparkSession,
    path: str,
    physical: T.StructType,
    new_tables: Sequence[str],
    output_base: str,
    keys: Sequence[str],
    snapshot_path: str | None = None,
    upto_file: str = "",
    upto_pos: int = -1,
    src_col: str = "_src",
    n_buckets: int = 64,
) -> dict[str, int]:
    """L7 — newly-added-table flow: bring tables into a RUNNING capture
    without restarting it from scratch.

    The reference suspends its binlog reader, snapshots the new tables,
    then wakes the reader with the merged table list
    (``MySqlSourceReader.java:141-201`` suspend/wakeup protocol).  This
    engine gets the same effect with no suspension, because the log is
    replayable and the state sink is an idempotent keyed merge:

    1. the running stream keeps materializing its current tables;
    2. this function BATCH-reads the new tables' history bounded at the
       stream's committed offset (``upto_file``/``upto_pos``) and merges
       it into each table's :class:`PartitionedStateTable` under epoch
       ``-1`` — ordered BEFORE every streamed epoch, so any overlap
       resolves to the streamed (newer) row;
    3. the caller widens the stream's table list (``fanout_by_table``'s
       ``tables``) and continues from the same checkpoint — events past
       the boundary land incrementally.

    No loss: history ≤ boundary comes from the batch read, > boundary
    from the stream.  No duplication: the keyed merge is idempotent and
    epoch ordering breaks ties.  Returns rows merged per table.
    """
    from ..sources.debezium import CHANGELOG_ORDER_BY, offset_sort_columns

    df = offset_sort_columns(
        read_cdc_batch(spark, path, physical, snapshot_path=snapshot_path)
    )
    # snapshot rows (_off_file = "") sort before any log file, so they are
    # always inside the bound; upto_pos is the last INCLUDED line index
    bounded = df.filter(
        (F.col("_off_file") < F.lit(upto_file))
        | (
            (F.col("_off_file") == F.lit(upto_file))
            & (F.col("_off_pos") <= F.lit(upto_pos))
        )
    )
    merged: dict[str, int] = {}
    for t in new_tables:
        slice_ = bounded.filter(F.col(f"{src_col}.table_name") == t)
        PartitionedStateTable(
            f"{output_base}/{t}", list(keys), n_buckets=n_buckets
        ).upsert(slice_, order_by=CHANGELOG_ORDER_BY, epoch_id=-1)
        merged[t] = slice_.count()
    return merged
