"""Event-time temporal table join (streaming/temporal_join.py): facts
enriched with the dim version valid at THEIR event time, buffered until the
dim watermark passes, final verdicts, replay idempotence."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from flink_cdc_log_connectors_spark.streaming.joins import JoinSide
from flink_cdc_log_connectors_spark.streaming.temporal_join import TemporalJoin

TRADES = T.StructType(
    [
        T.StructField("t_id", T.LongType()),
        T.StructField("sym", T.StringType()),
        T.StructField("qty", T.LongType()),
    ]
)
PRICES = T.StructType(
    [
        T.StructField("sym", T.StringType()),
        T.StructField("px", T.DoubleType()),
    ]
)

FACT = JoinSide(table="trades", physical=TRADES, key="t_id", join_col="sym")
DIM = JoinSide(table="prices", physical=PRICES, key="sym", join_col="sym")


def env(table, op, after=None, before=None, pos=0, ts=None):
    ts = 1000 + pos if ts is None else ts
    return json.dumps(
        {
            "before": before,
            "after": after,
            "op": op,
            "ts_ms": ts,
            "source": {"db": "d", "table": table, "ts_ms": ts,
                       "file": "f.0", "pos": pos},
        }
    )


def raw_df(spark, lines):
    return spark.createDataFrame(
        [(v, "f.0", i) for i, v in enumerate(lines)],
        "value string, file string, pos long",
    )


def view(spark, tj):
    df = tj.read_view(spark)
    if df is None:
        return {}
    return {r["t_id"]: (r["qty"], r["d_px"]) for r in df.collect()}


def test_temporal_join_versions_and_buffering(spark, tmp_path):
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")

    # batch 0: price v1 at ts=100; trades at ts=50 (before any version,
    # no match → dropped) and ts=150 (matches v1)
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=1, ts=50),
            env("trades", "c", {"t_id": 2, "sym": "A", "qty": 6}, pos=2, ts=150),
        ]),
        epoch_id=0,
    )
    # watermark = 100 < 150: trade 2 still buffered; trade 1 (ts=50 ≤ wm,
    # no version at-or-before 50) got its final no-match verdict
    assert view(spark, tj) == {}

    # batch 1: price v2 at ts=200 → wm=200 releases trade 2 against v1
    tj.process_batch(
        raw_df(spark, [
            env("prices", "u", {"sym": "A", "px": 20.0},
                before={"sym": "A", "px": 10.0}, pos=3, ts=200),
        ]),
        epoch_id=1,
    )
    assert view(spark, tj) == {2: (6, 10.0)}

    # batch 2: trade at ts=180 (old event arriving late on the fact side —
    # still ≤ wm, joins v1 not v2) and trade at ts=250 (buffered: wm=200)
    tj.process_batch(
        raw_df(spark, [
            env("trades", "c", {"t_id": 3, "sym": "A", "qty": 7}, pos=4, ts=180),
            env("trades", "c", {"t_id": 4, "sym": "A", "qty": 8}, pos=5, ts=250),
        ]),
        epoch_id=2,
    )
    got = view(spark, tj)
    assert got[3] == (7, 10.0)
    assert 4 not in got

    # batch 3: heartbeat at ts=300 flushes trade 4 against v2
    tj.process_batch(
        raw_df(spark, [env("prices", "h", pos=6, ts=300)]),
        epoch_id=3,
    )
    assert view(spark, tj)[4] == (8, 20.0)


def test_temporal_join_delete_closes_version(spark, tmp_path):
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="left")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("prices", "d", before={"sym": "A", "px": 10.0}, pos=1, ts=200),
            env("prices", "c", {"sym": "A", "px": 30.0}, pos=2, ts=300),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 1}, pos=3, ts=150),
            env("trades", "c", {"t_id": 2, "sym": "A", "qty": 2}, pos=4, ts=250),
            env("trades", "c", {"t_id": 3, "sym": "A", "qty": 3}, pos=5, ts=300),
            # heartbeat pushes wm past the ts=300 fact (strict emit bound)
            env("prices", "h", pos=6, ts=350),
        ]),
        epoch_id=0,
    )
    got = view(spark, tj)
    assert got[1] == (1, 10.0)   # before the delete
    assert got[2] == (2, None)   # inside the deleted window: left → NULL
    assert got[3] == (3, 30.0)   # after the re-insert


def test_temporal_join_inner_drops_deleted_window(spark, tmp_path):
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("prices", "d", before={"sym": "A", "px": 10.0}, pos=1, ts=200),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 1}, pos=2, ts=250),
            env("prices", "h", pos=3, ts=400),
        ]),
        epoch_id=0,
    )
    assert view(spark, tj) == {}
    # and the verdict is final: the fact left the pending buffer
    assert tj.pending.read(spark) is None or tj.pending.read(spark).count() == 0


def test_temporal_join_same_ms_dim_change_visible(spark, tmp_path):
    # a dim version stamped at exactly the fact's ts IS visible
    # (valid_ms <= rowtime is inclusive) — but the verdict only becomes
    # final once the watermark passes STRICTLY beyond the fact's ts
    # (another same-ms version could still arrive; see the split test)
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 1}, pos=1, ts=100),
        ]),
        epoch_id=0,
    )
    assert view(spark, tj) == {}  # wm == ts: not final yet
    tj.process_batch(
        raw_df(spark, [env("prices", "h", pos=2, ts=101)]), epoch_id=1
    )
    assert view(spark, tj)[1] == (1, 10.0)


def test_temporal_join_same_ms_split_across_batches(spark, tmp_path):
    """REGRESSION (r6): two dim changes at the SAME source millisecond
    with the microbatch boundary between them — the fact at that ms must
    join the LATER (higher-offset) version.  The pre-r6 inclusive emit
    bound (`_fact_ms <= wm`) issued a premature final verdict at the end
    of batch 0, pinning the earlier same-ms version forever."""
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 1}, pos=1, ts=100),
        ]),
        epoch_id=0,
    )
    assert view(spark, tj) == {}
    tj.process_batch(
        raw_df(spark, [
            env("prices", "u", {"sym": "A", "px": 20.0},
                before={"sym": "A", "px": 10.0}, pos=2, ts=100),
            env("prices", "h", pos=3, ts=101),
        ]),
        epoch_id=1,
    )
    # the same-ms, higher-offset version wins — not the batch-0 snapshot
    assert view(spark, tj)[1] == (1, 20.0)


def test_temporal_join_replay_idempotent(spark, tmp_path):
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    batch = raw_df(spark, [
        env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
        env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=1, ts=100),
        env("prices", "h", pos=2, ts=150),
    ])
    tj.process_batch(batch, epoch_id=0)
    before = view(spark, tj)
    tj.process_batch(batch, epoch_id=0)  # crash-retry of the same epoch
    assert view(spark, tj) == before == {1: (5, 10.0)}

    # a later batch still applies on top
    tj.process_batch(
        raw_df(spark, [
            env("prices", "u", {"sym": "A", "px": 20.0},
                before={"sym": "A", "px": 10.0}, pos=3, ts=200),
            env("trades", "c", {"t_id": 2, "sym": "A", "qty": 6}, pos=4, ts=200),
            env("prices", "h", pos=5, ts=250),
        ]),
        epoch_id=1,
    )
    assert view(spark, tj) == {1: (5, 10.0), 2: (6, 20.0)}


def test_temporal_join_streaming_end_to_end_with_restart(spark, tmp_path):
    """materialize_temporal_join over the cdclog source, including a
    restart from the checkpoint: buffered facts survive and flush once
    the dim watermark reaches them after the restart."""
    from flink_cdc_log_connectors_spark.sources.datasource import register
    from flink_cdc_log_connectors_spark.streaming.temporal_join import (
        materialize_temporal_join,
    )

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    with open(log_dir / "log-000001.jsonl", "w") as fh:
        fh.write(env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100) + "\n")
        fh.write(env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=1, ts=100) + "\n")
        fh.write(env("trades", "c", {"t_id": 2, "sym": "A", "qty": 6}, pos=2, ts=500) + "\n")

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def run_once():
        raw = spark.readStream.format("cdclog").option("path", str(log_dir)).load()
        q = (
            materialize_temporal_join(raw, FACT, DIM, out, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    tj = TemporalJoin(FACT, DIM, out)
    # wm == 100 == trade 1's ts: strict emit bound keeps BOTH trades
    # buffered across the restart (another same-ms price could follow)
    assert view(spark, tj) == {}

    with open(log_dir / "log-000002.jsonl", "w") as fh:
        fh.write(env("prices", "u", {"sym": "A", "px": 20.0},
                     before={"sym": "A", "px": 10.0}, pos=3, ts=400) + "\n")
        fh.write(env("prices", "h", pos=4, ts=600) + "\n")
    run_once()
    # restart consumed only the new file; trade 2 flushed against the
    # version valid at 500 (px=20 from ts=400)
    assert view(spark, tj) == {1: (5, 10.0), 2: (6, 20.0)}


def test_temporal_join_update_before_image_not_a_version(spark, tmp_path):
    # an update's before-image must not open a version: a fact between the
    # create and the update sees the CREATE value, and a fact after the
    # update sees the after-image — never a phantom version at update-ts
    # carrying the before value
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("prices", "u", {"sym": "A", "px": 20.0},
                before={"sym": "A", "px": 10.0}, pos=1, ts=200),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 1}, pos=2, ts=200),
            env("prices", "h", pos=3, ts=250),
        ]),
        epoch_id=0,
    )
    assert view(spark, tj)[1] == (1, 20.0)


import pytest


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_temporal_join_randomized_matches_naive_asof(spark, tmp_path, seed):
    """Random interleavings of dim creates/updates/deletes and facts across
    random batch boundaries: the maintained view must equal the naive
    as-of computation (latest dim version at-or-before each fact's ts,
    delete = no value), for every fact the final watermark covers."""
    import random

    rng = random.Random(seed)
    syms = ["A", "B"]
    events = []  # (kind, payload)
    ts = 100
    px = {s: None for s in syms}  # current dim value or None
    ver = []  # (sym, ts, pos, op, px) dim version log
    pos = 0
    for _ in range(40):
        ts += rng.randint(1, 50)
        if rng.random() < 0.5:
            s = rng.choice(syms)
            r = rng.random()
            if px[s] is None or r < 0.5:
                px[s] = float(rng.randint(1, 99))
                events.append(env("prices", "c", {"sym": s, "px": px[s]},
                                  pos=pos, ts=ts))
                ver.append((s, ts, pos, "c", px[s]))
            elif r < 0.8:
                old = px[s]
                px[s] = float(rng.randint(1, 99))
                events.append(env("prices", "u", {"sym": s, "px": px[s]},
                                  before={"sym": s, "px": old}, pos=pos, ts=ts))
                ver.append((s, ts, pos, "u", px[s]))
            else:
                events.append(env("prices", "d",
                                  before={"sym": s, "px": px[s]}, pos=pos, ts=ts))
                ver.append((s, ts, pos, "d", None))
                px[s] = None
        else:
            t_id = 1000 + pos
            s = rng.choice(syms)
            events.append(env("trades", "c",
                              {"t_id": t_id, "sym": s, "qty": pos}, pos=pos, ts=ts))
        pos += 1
    # final heartbeat flushes every buffered fact
    events.append(env("prices", "h", pos=pos, ts=ts + 1000))

    tj = TemporalJoin(FACT, DIM, str(tmp_path / "tj"), how="inner")
    i, epoch = 0, 0
    while i < len(events):
        n = rng.randint(1, 7)
        tj.process_batch(raw_df(spark, events[i : i + n]), epoch_id=epoch)
        i += n
        epoch += 1

    # naive as-of oracle
    import json as _json

    expect = {}
    for e in events:
        d = _json.loads(e)
        if d["source"]["table"] != "trades" or d["op"] != "c":
            continue
        f = d["after"]
        cand = [v for v in ver
                if v[0] == f["sym"] and (v[1], v[2]) <= (d["ts_ms"], 10**9)
                and v[1] <= d["ts_ms"]]
        if cand:
            best = max(cand, key=lambda v: (v[1], v[2]))
            if best[3] != "d":
                expect[f["t_id"]] = (f["qty"], best[4])
    assert view(spark, tj) == expect


def test_temporal_join_pk_changing_dim_update_closes_old_key(spark, tmp_path):
    """REGRESSION (r6): a PK-CHANGING dim update closes the OLD key's
    version at the update's rowtime (the before-image becomes an explicit
    'd' version — UPDATE_BEFORE).  Pre-fix the before-image was dropped,
    so facts after the rename kept matching the renamed dim forever."""
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "pkt"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            # A renamed to B at ts=200
            env("prices", "u", {"sym": "B", "px": 11.0},
                before={"sym": "A", "px": 10.0}, pos=1, ts=200),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=2, ts=250),
            env("trades", "c", {"t_id": 2, "sym": "A", "qty": 6}, pos=3, ts=150),
            env("trades", "c", {"t_id": 3, "sym": "B", "qty": 7}, pos=4, ts=250),
            env("prices", "h", pos=5, ts=300),
        ]),
        epoch_id=0,
    )
    got = view(spark, tj)
    # fact@150 sees A's v1; fact@250 on A sees the closing 'd' (no match);
    # fact@250 on B sees the renamed row
    assert got == {2: (6, 10.0), 3: (7, 11.0)}


def test_temporal_join_flush_tail_emits_high_water_facts(spark, tmp_path):
    """flush_tail: the explicit end-of-log alternative to a trailing
    heartbeat (VERDICT r6 #3) — facts AT the high-water timestamp, which
    the strict emit bound correctly defers, emit against the complete
    history when the caller declares the log drained."""
    tj = TemporalJoin(FACT, DIM, str(tmp_path / "ft"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=1, ts=50),
            # both at the high-water mark: deferred by the strict bound
            env("prices", "c", {"sym": "A", "px": 20.0}, pos=2, ts=100),
            env("trades", "c", {"t_id": 2, "sym": "A", "qty": 6}, pos=3, ts=100),
        ]),
        epoch_id=0,
    )
    # wm == 100: nothing is strictly below a version, trade 2 at == wm
    assert view(spark, tj) == {}
    tj.flush_tail(spark, epoch_id=1)
    # trade 1 (ts=50): no version at-or-before 50 → still no match;
    # trade 2 (ts=100): latest same-ms version (pos 2) wins
    assert view(spark, tj) == {2: (6, 20.0)}
    # flush is terminal for the buffered facts: re-flushing is a no-op
    tj.flush_tail(spark, epoch_id=2)
    assert view(spark, tj) == {2: (6, 20.0)}


def test_temporal_join_auto_compaction_bounds_history_and_stays_exact(
    spark, tmp_path
):
    """The r8 steady-state policy: with a small threshold, process_batch
    compacts the dim version history MID-stream (observable via the
    fired counter and the manifest), version lists stay bounded, and the
    maintained view is identical to what the uncompacted history gives —
    compaction is pure re-layout."""
    tj = TemporalJoin(
        FACT, DIM, str(tmp_path / "ac"), how="inner",
        history_compact_threshold=1,
    )
    for e in range(4):
        ts = 100 * (e + 1)
        tj.process_batch(
            raw_df(spark, [
                env("prices", "c", {"sym": "A", "px": 10.0 * (e + 1)},
                    pos=2 * e, ts=ts),
                env("trades", "c",
                    {"t_id": e, "sym": "A", "qty": e}, pos=2 * e + 1,
                    ts=ts + 50),
            ]),
            epoch_id=e,
        )
    assert tj.history_compactions >= 1
    assert tj.history.compactions_committed() >= 1
    lens = [
        len(v)
        for b, v in tj.history.load_manifest().items()
        if not b.startswith("__")
    ]
    assert lens and all(n <= 1 for n in lens)
    # trades 0..2 released as the watermark advanced; each joins the
    # version valid at ITS rowtime — straight through the compactions
    assert view(spark, tj) == {0: (0, 10.0), 1: (1, 20.0), 2: (2, 30.0)}


def test_temporal_join_flush_tail_crash_between_emit_and_tombstone(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7 ordering: flush_tail commits the output emit FIRST; a
    crash before the pending tombstone leaves the facts buffered, and a
    same-epoch retry re-emits identically instead of silently losing
    them (the pre-fix order tombstoned first — the retry then saw an
    empty buffer and the buffered facts were never emitted)."""
    from flink_cdc_log_connectors_spark.streaming.statetable import (
        PartitionedStateTable,
    )

    tj = TemporalJoin(FACT, DIM, str(tmp_path / "ft"), how="inner")
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c", {"sym": "A", "px": 10.0}, pos=0, ts=100),
            env("trades", "c", {"t_id": 1, "sym": "A", "qty": 5}, pos=1,
                ts=100),
        ]),
        epoch_id=0,
    )
    assert view(spark, tj) == {}  # at the high-water mark: deferred

    real_upsert = PartitionedStateTable.upsert
    def crash_on_pending(self, *a, **k):
        if self.path.endswith("__pending"):
            raise RuntimeError("simulated crash before tombstone commit")
        return real_upsert(self, *a, **k)

    monkeypatch.setattr(PartitionedStateTable, "upsert", crash_on_pending)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        tj.flush_tail(spark, epoch_id=1)
    monkeypatch.setattr(PartitionedStateTable, "upsert", real_upsert)
    # output already carries the verdict; the fact is STILL buffered,
    # and the same-epoch retry converges without losing it
    assert view(spark, tj) == {1: (5, 10.0)}
    assert tj.pending.read(spark) is not None
    tj.flush_tail(spark, epoch_id=1)
    assert view(spark, tj) == {1: (5, 10.0)}
    assert tj.pending.read(spark) is None


def test_temporal_join_rejects_join_key_type_mismatch(tmp_path):
    """History-bucket pruning hashes the fact join column with the dim
    key's bucket hash; xxhash64(int) != xxhash64(long) for equal values,
    so a type mismatch would silently prune the WRONG buckets — it must
    refuse at construction instead."""
    import pytest
    from pyspark.sql import types as T

    fact_int = JoinSide(
        table="trades",
        physical=T.StructType([
            T.StructField("t_id", T.LongType()),
            T.StructField("sym", T.IntegerType()),
            T.StructField("qty", T.LongType()),
        ]),
        key="t_id",
        join_col="sym",
    )
    dim_long = JoinSide(
        table="prices",
        physical=T.StructType([
            T.StructField("sym", T.LongType()),
            T.StructField("px", T.DoubleType()),
        ]),
        key="sym",
        join_col="sym",
    )
    with pytest.raises(ValueError, match="same type"):
        TemporalJoin(fact_int, dim_long, str(tmp_path / "tm"))


def test_history_retention_prunes_superseded_versions(spark, tmp_path):
    """history_retention_ms: compaction expires versions SUPERSEDED at or
    before watermark - retention, keeping per key the reigning version at
    the cutoff — facts within the declared lateness bound join exactly
    what they would have against the full history."""
    from pyspark.sql import functions as F

    tj = TemporalJoin(
        FACT,
        DIM,
        str(tmp_path / "ret"),
        how="inner",
        history_compact_threshold=2,
        history_retention_ms=500,
    )
    # 6 price versions for A at ts 100..600, one for B at 150, spread
    # over epochs so the version lists exceed the threshold and
    # compaction fires with the watermark at 600
    ticks = [(100, 10.0), (200, 20.0), (300, 30.0)]
    tj.process_batch(
        raw_df(spark, [
            env("prices", "c" if t == 100 else "u", {"sym": "A", "px": px},
                pos=i, ts=t)
            for i, (t, px) in enumerate(ticks)
        ] + [env("prices", "c", {"sym": "B", "px": 1.0}, pos=9, ts=150)]),
        epoch_id=0,
    )
    for e, (t, px) in enumerate([(400, 40.0), (500, 50.0), (600, 60.0)]):
        tj.process_batch(
            raw_df(spark, [
                env("prices", "u", {"sym": "A", "px": px}, pos=10 + e, ts=t)
            ]),
            epoch_id=1 + e,
        )
    assert tj.history_compactions >= 1
    # cutoff = 600 - 500 = 100: A's v@100 is the reigning version at the
    # cutoff and SURVIVES; nothing is superseded below it, so only
    # versions strictly dominated at <= 100 would go — build more churn
    # below a later cutoff to see pruning:
    for e, t in enumerate([1100, 1200]):  # advance wm to 1200, cutoff 700
        tj.process_batch(
            raw_df(spark, [
                env("prices", "u", {"sym": "A", "px": float(t)},
                    pos=20 + e, ts=t)
            ]),
            epoch_id=4 + e,
        )
    # force one more compaction at the advanced watermark
    tj.history.compact(
        spark,
        epoch_id=tj.history.compactions_committed() + 1,
        transform=tj._retention_transform(),
    )
    hist = tj.history.read(spark)
    a_rows = sorted(
        r["_valid_ms"] for r in hist.filter(F.col("sym") == "A").collect()
    )
    # cutoff 700: versions 100..500 are all superseded by v@600 <= 700 —
    # only the reigning v@600 survives below the cutoff, plus 1100/1200
    assert a_rows == [600, 1100, 1200]
    # B's single version (reigning at cutoff) survives
    assert [r["_valid_ms"] for r in hist.filter(F.col("sym") == "B").collect()] == [150]

    # facts within the lateness bound still join the right versions:
    # ts=650 -> v@600; ts=1150 -> v@1100
    tj.process_batch(
        raw_df(spark, [
            env("trades", "c", {"t_id": 7, "sym": "A", "qty": 1}, pos=30, ts=650),
            env("trades", "c", {"t_id": 8, "sym": "A", "qty": 2}, pos=31, ts=1150),
            env("prices", "h", None, pos=32, ts=2000),  # heartbeat releases
        ]),
        epoch_id=6,
    )
    got = view(spark, tj)
    assert got[7] == (1, 60.0) and got[8] == (2, 1100.0)
