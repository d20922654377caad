"""Epoch sequencing + idle-stream expiry (streaming/epochs.py): a
quiesced CDC stream must converge to the retention-window oracle without
a manual expire() — VERDICT r9 What's-missing #6 — and the shared epoch
namespace must keep idle-expiry epochs and Structured Streaming batch
ids collision-free under retries."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.streaming.aggregates import (
    ChangelogAggregate,
)
from flink_cdc_log_connectors_spark.streaming.epochs import (
    EpochSequencer,
    IdleExpiryMonitor,
    idle_expiry_writer,
    sequenced_process_batch,
)

ORDERS_TS = T.StructType(
    [
        T.StructField("o_id", T.LongType()),
        T.StructField("cust_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ets", T.LongType()),
    ]
)


def env(op, after=None, before=None, pos=0):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "op": op,
            "ts_ms": 1000 + pos,
            "source": {"db": "d", "table": "orders", "ts_ms": 1000 + pos,
                       "file": "f.0", "pos": pos},
        }
    )


def raw_df(spark, lines):
    return spark.createDataFrame(
        [(v, "f.0", i) for i, v in enumerate(lines)],
        "value string, file string, pos long",
    )


def _row(o, c, a, ets):
    return {"o_id": o, "cust_id": c, "amount": a, "ets": ets}


def make_ttl_agg(tmp_path, name="idle"):
    return ChangelogAggregate(
        "orders", ORDERS_TS, key="o_id", group_cols=["cust_id"],
        output_path=str(tmp_path / name),
        sum_cols=["amount"], ttl=100, ttl_col="ets", n_buckets=8,
    )


def view(spark, agg):
    df = agg.read_view(spark)
    if df is None:
        return {}
    return {r["cust_id"]: (r["cnt"], r["sum_amount"]) for r in df.collect()}


# -- EpochSequencer ----------------------------------------------------------

def test_sequencer_allocates_monotone_and_retry_stable(tmp_path):
    seq = EpochSequencer(str(tmp_path))
    assert seq.last() == -1
    assert seq.allocate("stream", 0) == 0
    assert seq.allocate("stream", 1) == 1
    assert seq.allocate("idle", 7) == 2
    assert seq.allocate("stream", 2) == 3
    # retries — any order, any interleaving — return the SAME ids
    assert seq.allocate("stream", 1) == 1
    assert seq.allocate("idle", 7) == 2
    assert seq.last() == 3
    # a new instance over the same dir sees the persisted state
    assert EpochSequencer(str(tmp_path)).allocate("stream", 2) == 3


def test_sequencer_refuses_beyond_window_replay(tmp_path):
    from flink_cdc_log_connectors_spark.streaming import epochs

    seq = EpochSequencer(str(tmp_path))
    for i in range(epochs._MAP_WINDOW + 10):
        seq.allocate("stream", i)
    # id 0's mapping has been trimmed; replaying it must refuse loudly
    # (a fresh high epoch would let its stale rows win the merge) — and
    # say it was TRIMMED, not "never allocated" (ADVICE r10)
    with pytest.raises(ValueError, match="has been trimmed"):
        seq.allocate("stream", 0)
    # recent ids are still retry-stable
    assert seq.allocate("stream", epochs._MAP_WINDOW + 9) == (
        epochs._MAP_WINDOW + 9
    )


def test_sequencer_distinguishes_gap_from_trim(tmp_path):
    """ADVICE r10: a source_id the source simply SKIPPED (never
    allocated, below the max seen) must not be misreported as a trimmed
    mapping — the operator fixes a broken source, not a lost sequencer
    file."""
    seq = EpochSequencer(str(tmp_path))
    seq.allocate("stream", 5)
    with pytest.raises(ValueError, match="never allocated"):
        seq.allocate("stream", 3)


def test_sequencer_trims_source_name_containing_colon(tmp_path):
    """ADVICE r11: trim_max extracted the trimmed id with
    split(':', 1)[1], so a source NAME containing ':' (e.g. a
    'db:table' routing label) blew up with ValueError inside allocate()
    the first time its window trimmed; the id is now sliced off by
    prefix length."""
    from flink_cdc_log_connectors_spark.streaming import epochs

    seq = EpochSequencer(str(tmp_path))
    for i in range(epochs._MAP_WINDOW + 5):
        seq.allocate("db:orders", i)  # trims without raising
    with pytest.raises(ValueError, match="has been trimmed"):
        seq.allocate("db:orders", 0)
    assert seq.allocate("db:orders", epochs._MAP_WINDOW + 4) == (
        epochs._MAP_WINDOW + 4
    )


# -- IdleExpiryMonitor (deterministic ticks) ---------------------------------

def test_idle_monitor_flushes_quiesced_stream_and_rearms(spark, tmp_path):
    agg = make_ttl_agg(tmp_path)
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
        env("c", _row(3, 2, 3.0, 150), pos=2),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    # per-batch expiry lags one epoch: o2 (ets 1000) is expirable at the
    # stored watermark (cutoff 1000) but still served — the gap the
    # idle monitor closes
    assert view(spark, agg) == {1: (1, 7.0), 3: (1, 2.0)}

    mon = IdleExpiryMonitor(agg, seq, idle_triggers=2)
    assert mon.on_trigger(spark, 0) is False  # syncs the cursor
    assert mon.on_trigger(spark, 1) is False  # idle 1 < 2
    assert mon.on_trigger(spark, 2) is True   # fires: o2 expires
    assert view(spark, agg) == {3: (1, 2.0)}
    # one flush per quiet period: nothing more can expire until data
    # moves the watermark, so further ticks are silent
    for t in (3, 4, 5, 6):
        assert mon.on_trigger(spark, t) is False
    # data resumes (cursor moves) → monitor re-arms; after the stream
    # quiesces again the NEW tail (o4, ets 1100 ≤ new cutoff 1100)
    # flushes too
    feed(raw_df(spark, [env("c", _row(5, 1, 4.0, 1200), pos=20)]), 2)
    assert view(spark, agg) == {1: (1, 4.0), 3: (1, 2.0)}
    assert mon.on_trigger(spark, 7) is False
    assert mon.on_trigger(spark, 8) is False
    assert mon.on_trigger(spark, 9) is True
    assert view(spark, agg) == {1: (1, 4.0)}


def test_idle_monitor_retried_tick_is_idempotent(spark, tmp_path):
    """A ticker retry re-delivers the SAME trigger id after the expiry
    already committed: the sequencer hands back the same epoch, the
    monitor sees it at-or-below the committed max, and skips the pass
    instead of tripping expire()'s freshness guard."""
    agg = make_ttl_agg(tmp_path)
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    mon = IdleExpiryMonitor(agg, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False
    assert mon.on_trigger(spark, 1) is True
    assert view(spark, agg) == {3: (1, 2.0)}
    # crash-and-retry of tick 1: wipe the advisory monitor state so the
    # idle path re-fires with the same trigger id
    import os

    os.remove(mon._state_path)
    assert mon.on_trigger(spark, 1) is False  # re-sync
    assert mon.on_trigger(spark, 1) is True   # re-fires, same epoch, skips
    assert view(spark, agg) == {3: (1, 2.0)}


def test_sequencer_trims_per_source(tmp_path):
    """r10 code review: a global oldest-first trim let a busy source
    (one idle tick per quiet period, forever) evict another source's
    RECENT mappings — the idle witness's replayed stream epochs 0-2
    would start refusing after ~126 harness re-runs.  Trimming is per
    source: 200 idle allocations must leave stream:0-2 retry-stable."""
    from flink_cdc_log_connectors_spark.streaming import epochs

    seq = EpochSequencer(str(tmp_path))
    stream_ids = [seq.allocate("stream", i) for i in range(3)]
    for t in range(epochs._MAP_WINDOW + 72):
        seq.allocate("idle", t)
    assert [seq.allocate("stream", i) for i in range(3)] == stream_ids
    # the idle source still trims among its own
    with pytest.raises(ValueError, match="beyond the retry window"):
        seq.allocate("idle", 0)


def test_crashed_expire_pass_is_retryable_and_completes(spark, tmp_path):
    """r10 code review (the headline finding): a crash BETWEEN an
    expire() pass's fact-state commit and its output commit must stay
    recoverable.  The freshness guard admits the same-epoch retry while
    its staged decision is still on disk (the stage is only GC'd by
    finalize, after everything committed), and the idle monitor runs —
    not skips — the retry.  Pre-fix, the guard refused the retry and
    the monitor marked it done: the view served expired facts forever."""
    agg = make_ttl_agg(tmp_path, "crash")
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    assert view(spark, agg) == {1: (1, 7.0), 3: (1, 2.0)}  # o2 expirable

    mon = IdleExpiryMonitor(agg, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False  # sync
    # crash AFTER the fact-state deletion commits, BEFORE the view
    # upsert — the exact window the staged decision exists for
    orig = agg.output.upsert

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    agg.output.upsert = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        mon.on_trigger(spark, 1)
    agg.output.upsert = orig
    # the crashed tick's own allocation moved the sequencer cursor, so
    # the next tick re-syncs; the one after detects the published stage
    # whose epoch committed fact state (pending) and completes THAT
    # pass — the guard admits the same-epoch retry while the stage is
    # on disk
    assert mon.on_trigger(spark, 2) is False  # re-sync on cursor move
    assert mon.on_trigger(spark, 3) is True   # completes the crashed pass
    assert view(spark, agg) == {3: (1, 2.0)}
    # ...and with the stage GC'd, recycled MANIFEST-VISIBLE ids are
    # refused again (the recovery emptied every epoch-2 bucket, so id 2
    # itself legitimately left no manifest trace)
    with pytest.raises(ValueError, match="FRESH epoch id"):
        agg.expire(spark, epoch_id=1)


def test_crashed_expire_recovers_on_data_path(spark, tmp_path):
    """VERDICT r10 #1 (self-healing): a crashed expire() pass used to
    make every subsequent DATA batch's stage() raise until the idle
    ticker fired or an operator re-ran the pass by hand — an outage on
    a busy stream without the ticker deployed.  The sequenced data path
    now completes the pending staged pass FIRST (it already holds the
    namespace lock), then processes the batch: no ticker, no manual
    expire(), view converges to the retention oracle."""
    agg = make_ttl_agg(tmp_path, "heal")
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    assert view(spark, agg) == {1: (1, 7.0), 3: (1, 2.0)}  # o2 expirable

    # crash an idle pass AFTER its fact-state deletion commits, BEFORE
    # the view upsert — the staged decision survives as recovery evidence
    mon = IdleExpiryMonitor(agg, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False  # sync
    orig = agg.output.upsert

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    agg.output.upsert = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        mon.on_trigger(spark, 1)
    agg.output.upsert = orig
    assert agg._ttl_proto.staged_epochs() == [2]

    # a BUSY stream: the next data batch self-heals — completes epoch
    # 2's staged pass (o2's retraction reaches the view), then processes
    # its own rows under a fresh epoch
    feed(raw_df(spark, [env("c", _row(5, 1, 4.0, 1200), pos=20)]), 2)
    assert agg._ttl_proto.staged_epochs() == []
    assert view(spark, agg) == {1: (1, 4.0), 3: (1, 2.0)}


def test_crashed_data_epoch_retry_reuses_own_stage(spark, tmp_path):
    """The self-heal must NOT swallow a data epoch's OWN retry: a batch
    that crashed between staging its expiry decision and committing the
    view re-delivers with the same batch id — the pending stage belongs
    to this very epoch, and process_batch's stage() replays it inline
    (running expire() on it first would apply the retractions without
    the batch's rows, then the batch would re-stage nothing)."""
    agg = make_ttl_agg(tmp_path, "retry")
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    # epoch 1 expires o1 (cutoff 900); crash its view upsert
    orig = agg.output.upsert

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    agg.output.upsert = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    agg.output.upsert = orig
    assert agg._ttl_proto.staged_epochs() == [1]
    # Structured Streaming retries the SAME batch id
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    assert agg._ttl_proto.staged_epochs() == []
    assert view(spark, agg) == {1: (1, 7.0), 3: (1, 2.0)}


def test_crashed_expire_recovers_on_raw_data_path(spark, tmp_path):
    """The self-heal lives in the consumers' own ``process_batch`` entry
    (``heal_pending_expiry``), so RAW foreachBatch deployments — the
    ``materialize_aggregate`` wiring, no sequencer — recover from a
    crashed expire() pass on their next data batch too."""
    agg = make_ttl_agg(tmp_path, "rawheal")
    agg.process_batch(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    agg.process_batch(
        raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1
    )
    orig = agg.output.upsert

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    agg.output.upsert = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        agg.expire(spark, epoch_id=2)
    agg.output.upsert = orig
    assert agg._ttl_proto.staged_epochs() == [2]
    agg.process_batch(
        raw_df(spark, [env("c", _row(5, 1, 4.0, 1200), pos=20)]), 3
    )
    assert agg._ttl_proto.staged_epochs() == []
    assert view(spark, agg) == {1: (1, 4.0), 3: (1, 2.0)}


def test_raw_id_collision_with_pending_stage_folds_inline(spark, tmp_path):
    """Raw-id hazard the carve-out exists for: the next batch's id
    EQUALS the crashed pass's epoch — the heal skips it and the batch's
    own ``stage()`` reuses the staged decision, folding the retractions
    with the batch's rows (the pytest-proven same-epoch retry path)."""
    agg = make_ttl_agg(tmp_path, "rawcoll")
    agg.process_batch(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    agg.process_batch(
        raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1
    )
    orig = agg.output.upsert

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    agg.output.upsert = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        agg.expire(spark, epoch_id=2)
    agg.output.upsert = orig
    agg.process_batch(
        raw_df(spark, [env("c", _row(5, 1, 4.0, 1200), pos=20)]), 2
    )
    assert agg._ttl_proto.staged_epochs() == []
    assert view(spark, agg) == {1: (1, 4.0), 3: (1, 2.0)}


def test_idle_monitor_refuses_out_of_namespace_state(spark, tmp_path):
    """State committed under ids the sequencer never allocated (a
    consumer previously driven by raw Structured Streaming batch ids)
    would make every 'fresh' sequencer epoch look like a retry and
    silently suppress expiry — the monitor must refuse loudly."""
    agg = make_ttl_agg(tmp_path, "ns")
    # epochs bypass the sequencer entirely
    agg.process_batch(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), epoch_id=0)
    agg.process_batch(
        raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), epoch_id=1
    )
    seq = EpochSequencer(agg.output.path)
    mon = IdleExpiryMonitor(agg, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False
    with pytest.raises(ValueError, match="flow through the sequencer"):
        mon.on_trigger(spark, 1)


def test_idle_monitor_requires_ttl_consumer(tmp_path):
    agg = ChangelogAggregate(
        "orders", ORDERS_TS, key="o_id", group_cols=["cust_id"],
        output_path=str(tmp_path / "nottl"), sum_cols=["amount"],
    )
    with pytest.raises(ValueError, match="TTL'd consumer"):
        IdleExpiryMonitor(agg, EpochSequencer(agg.output.path))


def test_idle_monitor_flushes_join_consumer(spark, tmp_path):
    """The monitor is consumer-agnostic: a TTL'd ChangelogJoin quiesced
    with an expirable fact converges the join VIEW (tombstone) through
    the same ticks."""
    from flink_cdc_log_connectors_spark.streaming.joins import (
        ChangelogJoin,
        JoinSide,
    )

    orders = T.StructType([
        T.StructField("o_id", T.LongType()),
        T.StructField("cust_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ots", T.LongType()),
    ])
    custs = T.StructType([
        T.StructField("c_id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])

    def jenv(table, op, after=None, before=None, pos=0):
        return json.dumps({
            "before": before, "after": after, "op": op, "ts_ms": 1000 + pos,
            "source": {"db": "d", "table": table, "ts_ms": 1000 + pos,
                       "file": "f.0", "pos": pos},
        })

    join = ChangelogJoin(
        JoinSide("orders", orders, key="o_id", join_col="cust_id"),
        JoinSide("customers", custs, key="c_id", join_col="c_id"),
        str(tmp_path / "jidle"), how="inner",
        left_ttl=100, left_ttl_col="ots", n_buckets=8,
    )
    seq = EpochSequencer(join.output.path)
    feed = sequenced_process_batch(join, seq)
    feed(raw_df(spark, [
        jenv("customers", "c", {"c_id": 1, "name": "ada"}, pos=0),
        jenv("orders", "c",
             {"o_id": 10, "cust_id": 1, "amount": 5.0, "ots": 100}, pos=1),
        jenv("orders", "c",
             {"o_id": 11, "cust_id": 1, "amount": 7.0, "ots": 1000}, pos=2),
    ]), 0)
    feed(raw_df(spark, [
        jenv("orders", "c",
             {"o_id": 12, "cust_id": 1, "amount": 2.0, "ots": 1100}, pos=3),
    ]), 1)
    rows = {r["o_id"] for r in join.read_view(spark).collect()}
    assert rows == {11, 12}  # o10 expired mid-stream; o11 lingers (lag)
    mon = IdleExpiryMonitor(join, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False
    assert mon.on_trigger(spark, 1) is True
    rows = {r["o_id"] for r in join.read_view(spark).collect()}
    assert rows == {12}  # the idle flush tombstoned o11 (ots 1000 ≤ cutoff)


def test_idle_monitor_flushes_topn_consumer(spark, tmp_path):
    """VERDICT r10 #2: Top-N composes TTL with RANK MAINTENANCE — an
    idle flush that expires a ranked row must promote the survivors and
    refill the freed slot, the interaction most likely to hide a bug."""
    from flink_cdc_log_connectors_spark.streaming.topn import ChangelogTopN

    topn = ChangelogTopN(
        "orders", ORDERS_TS, key="o_id", partition_cols=["cust_id"],
        order_col="amount", n=2, output_path=str(tmp_path / "tidle"),
        n_buckets=8, ttl=100, ttl_col="ets",
    )
    seq = EpochSequencer(topn.output.path)
    feed = sequenced_process_batch(topn, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 1050), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
        env("c", _row(3, 1, 6.0, 1040), pos=2),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)

    def ranks():
        return {
            (r["cust_id"], r["rn"]): r["o_id"]
            for r in topn.read_view(spark).collect()
        }

    # nothing expired yet (epoch 1's cutoff 900 < every ets): o2 leads
    assert ranks() == {(1, 1): 2, (1, 2): 3, (3, 1): 4}
    mon = IdleExpiryMonitor(topn, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False
    assert mon.on_trigger(spark, 1) is True
    # idle flush (cutoff 1000) expired o2: o3 promotes to rank 1 and o1
    # — previously OUTSIDE the top 2 — enters at rank 2 from fact state
    assert ranks() == {(1, 1): 3, (1, 2): 1, (3, 1): 4}


def test_idle_monitor_flushes_cagg_consumer(spark, tmp_path):
    """VERDICT r10 #2: the continuous aggregate composes TTL with
    window RE-BUCKETING (group col DERIVED from event time) — an idle
    flush must drain and tombstone whole retention-expired buckets."""
    cagg = ChangelogAggregate(
        "orders", ORDERS_TS, key="o_id", group_cols=["bkt"],
        output_path=str(tmp_path / "cidle"), sum_cols=["amount"],
        n_buckets=8, ttl=100, ttl_col="ets",
        derive=lambda df: df.withColumn(
            "bkt", (df["ets"] / 100).cast("long")
        ),
    )
    seq = EpochSequencer(cagg.output.path)
    feed = sequenced_process_batch(cagg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)

    def buckets():
        df = cagg.read_view(spark)
        return {} if df is None else {
            r["bkt"]: (r["cnt"], r["sum_amount"]) for r in df.collect()
        }

    # epoch 1 (cutoff 900) drained bucket 1 (o1); o2's bucket 10 lingers
    assert buckets() == {10: (1, 7.0), 11: (1, 2.0)}
    mon = IdleExpiryMonitor(cagg, seq, idle_triggers=1)
    assert mon.on_trigger(spark, 0) is False
    assert mon.on_trigger(spark, 1) is True
    # idle flush (cutoff 1000) expired o2: bucket 10 tombstones away
    assert buckets() == {11: (1, 2.0)}


@pytest.mark.parametrize("layout", ["output_path", "checkpoint"])
def test_checkpoint_sequencer_restore_drill(
    spark, tmp_path, monkeypatch, layout
):
    """VERDICT r10 #5: the sequencer file is a recovery artifact NEXT TO
    the Structured Streaming checkpoint — its restore-alongside contract
    (epochs.py allocate()) was error-messaged but never drilled end to
    end.  The drill: snapshot state+sequencer mid-stream, continue, then
    (a) restore checkpoint state WITHOUT the matching sequencer file —
    the replayed batch is REFUSED (its mapping was trimmed from the
    newer file; a fresh epoch would let stale rows beat newer state);
    (b) restore state AND sequencer together — the replay re-allocates
    the same epochs and converges to the straight-through view.

    r12 (VERDICT r11 #6): parametrized over BOTH supported layouts —
    the sequencer rooted at the consumer's output path, and the
    ``EpochSequencer.for_checkpoint`` default that roots it inside the
    checkpoint directory so one checkpoint backup carries the offset
    log and the epoch mapping by construction."""
    import shutil

    from flink_cdc_log_connectors_spark.streaming import epochs

    monkeypatch.setattr(epochs, "_MAP_WINDOW", 4)
    root = tmp_path / "drill"

    def mk(i):
        return raw_df(
            spark,
            [env("c", _row(100 + i, i % 2, float(i), 1000 + i), pos=i)],
        )

    # both layouts keep the sequencer INSIDE the snapshotted root (the
    # backup the drill copies): the checkpoint dir lives under the
    # output tree here purely so one copytree models "one backup covers
    # checkpoint + state" — in production for_checkpoint points at the
    # real Structured Streaming checkpointLocation
    def mk_seq(a):
        if layout == "checkpoint":
            return EpochSequencer.for_checkpoint(str(root / "ckpt"))
        return EpochSequencer(a.output.path)

    seq_file = (
        root / "ckpt" / "__epoch_seq" / "__seq.json"
        if layout == "checkpoint"
        else root / "view" / "__seq.json"
    )
    agg = make_ttl_agg(tmp_path, "drill")
    feed = sequenced_process_batch(agg, mk_seq(agg))
    for i in range(3):
        feed(mk(i), i)
    snap = tmp_path / "snap"
    shutil.copytree(root, snap)  # the mid-stream backup: state + seq
    for i in range(3, 9):
        feed(mk(i), i)
    expected = view(spark, agg)
    assert expected == {0: (5, 20.0), 1: (4, 16.0)}
    cur_seq = seq_file.read_bytes()

    # (a) state restored from backup, sequencer file NOT restored (the
    # live, post-continue file stays): batch 3's mapping was trimmed
    # (window 4 retains ids 5-8) — refused before any state mutation
    shutil.rmtree(root)
    shutil.copytree(snap, root)
    seq_file.parent.mkdir(parents=True, exist_ok=True)
    seq_file.write_bytes(cur_seq)
    agg2 = make_ttl_agg(tmp_path, "drill")
    feed2 = sequenced_process_batch(agg2, mk_seq(agg2))
    with pytest.raises(ValueError, match="has been trimmed"):
        feed2(mk(3), 3)

    # (b) state AND sequencer restored together: the replayed batches
    # re-allocate their original epochs and the view converges
    shutil.rmtree(root)
    shutil.copytree(snap, root)
    agg3 = make_ttl_agg(tmp_path, "drill")
    feed3 = sequenced_process_batch(agg3, mk_seq(agg3))
    for i in range(3, 9):
        feed3(mk(i), i)
    assert view(spark, agg3) == expected


def test_consumer_state_metrics_surface(spark, tmp_path):
    """VERDICT r10 #8: the deterministic scale axes (expiry counter, dim
    read pruning, TTL watermark, pending crashed passes) are exposed as
    a C11 metrics dict — no Spark jobs, two JSON reads at most."""
    from flink_cdc_log_connectors_spark.streaming.joins import (
        ChangelogJoin,
        JoinSide,
    )
    from flink_cdc_log_connectors_spark.streaming.pipeline import (
        consumer_state_metrics,
    )

    agg = make_ttl_agg(tmp_path, "metrics")
    assert consumer_state_metrics(agg) == {
        "expiredApplied": 0,
        "watermark": None,
        "pendingExpiryEpochs": [],
    }
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    m = consumer_state_metrics(agg)
    # epoch 1 expired o1 (cutoff 900); watermark = max ets committed
    assert m["expiredApplied"] == 1
    assert m["watermark"] == 1100
    assert m["pendingExpiryEpochs"] == []

    # a join consumer additionally exposes the dim-read pruning axis
    join = ChangelogJoin(
        JoinSide("facts", ORDERS_TS, key="o_id", join_col="cust_id"),
        JoinSide(
            "dims",
            T.StructType([T.StructField("c_id", T.LongType())]),
            key="c_id",
            join_col="c_id",
        ),
        str(tmp_path / "jmetrics"),
        left_ttl=100,
        left_ttl_col="ets",
    )
    jm = consumer_state_metrics(join)
    assert jm["dimBucketsOpened"] is None  # no enrichment read yet
    assert jm["expiredApplied"] == 0


def test_state_metrics_listener_publishes_merged_payload(spark, tmp_path):
    """VERDICT r11 #7: the listener wiring around the C11 gauges — one
    publish per progress event carrying the query's source metrics AND
    every registered consumer's state gauges; a publish failure warns
    instead of propagating into the listener thread."""
    import warnings

    from flink_cdc_log_connectors_spark.streaming.pipeline import (
        state_metrics_listener,
    )

    agg = make_ttl_agg(tmp_path, "listener")
    feed = sequenced_process_batch(agg, EpochSequencer(agg.output.path))
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)

    got = []
    listener = state_metrics_listener({"agg": agg}, got.append)

    class _Event:
        progress = {"batchId": 7, "numInputRows": 3, "sources": []}

    listener.onQueryProgress(_Event())
    assert len(got) == 1
    assert got[0]["query"]["batchId"] == 7
    m = got[0]["consumers"]["agg"]
    assert m["expiredApplied"] == 1 and m["watermark"] == 1100

    def boom(_):
        raise RuntimeError("sink down")

    bad = state_metrics_listener({"agg": agg}, boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad.onQueryProgress(_Event())  # must not raise
    assert any("publish failed" in str(x.message) for x in w)


# -- the real ticker: a rate-source stream, no manual expire() --------------

def test_quiesced_stream_converges_via_rate_ticker(spark, tmp_path):
    """VERDICT r9 done-criterion: a pytest with a QUIESCED stream
    converging without a manual expire().  The data stream stops after
    two batches; only the rate-source ticker runs."""
    agg = make_ttl_agg(tmp_path, "rate")
    seq = EpochSequencer(agg.output.path)
    feed = sequenced_process_batch(agg, seq)
    feed(raw_df(spark, [
        env("c", _row(1, 1, 5.0, 100), pos=0),
        env("c", _row(2, 1, 7.0, 1000), pos=1),
    ]), 0)
    feed(raw_df(spark, [env("c", _row(4, 3, 2.0, 1100), pos=10)]), 1)
    assert view(spark, agg) == {1: (1, 7.0), 3: (1, 2.0)}  # o2 lingers

    q = idle_expiry_writer(
        agg, seq, spark,
        checkpoint_path=str(tmp_path / "rate_ckpt"),
        interval="500 milliseconds", idle_triggers=2,
    ).start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            # the poller legitimately races the ticker's commit: a read
            # can resolve bucket paths from the pre-flush manifest and
            # lose them to post-swap GC mid-scan — transient by design
            # (atomic manifest swap; single WRITER, readers retry)
            try:
                if view(spark, agg) == {3: (1, 2.0)}:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    # writer stopped: the read is stable and must show the flushed view
    assert view(spark, agg) == {3: (1, 2.0)}, (
        "quiesced stream did not converge to the retention-window "
        "view within 60s of ticker time"
    )
