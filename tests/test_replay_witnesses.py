"""Replay-witness fixtures and their discrimination power.

The witnesses themselves (engine replay vs DuckDB oracle) run in
scripts/selfcheck.py and the driver; these tests pin the properties the
oracles' verdicts REST on:

1. the keyed CDC fixture is WELL-FORMED (inserts only on dead keys,
   before-images are the key's true current row) — the IVM views'
   touched-group tracking is only sound for well-formed logs;
2. the fixture actually exercises the r6-fixed semantics (NULL groups
   populated, PK-changing renames present);
3. the oracles DISCRIMINATE the r6 fixes: re-introducing either pre-fix
   behavior (dropped UPDATE_BEFORE images; null-UNSAFE membership joins)
   makes the maintained view diverge from the post-fix one.
"""

from __future__ import annotations

import functools
import operator

import pytest
from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.operators.replay import (
    _keyed_state_envelopes,
    _keyed_state_schema,
    _replay_keyed_batches,
)
from flink_cdc_log_connectors_spark.sources.debezium import parse_debezium


@pytest.fixture(scope="module")
def keyed_rows(spark, sf_dir):
    env = _keyed_state_envelopes(spark, sf_dir)
    parsed = parse_debezium(env, _keyed_state_schema())
    return [r.asDict() for r in parsed.collect()]


def test_keyed_fixture_is_well_formed_cdc(keyed_rows):
    """Replay the log per key: 'c' only on dead keys, 'u'/'d' only on
    live keys, and every before-image equals the key's live row."""
    rows = sorted(
        keyed_rows, key=lambda r: (r["_src"]["pos"], r["_src"]["img_seq"])
    )
    live: dict[int, tuple] = {}
    n_upd = n_del = 0
    for r in rows:
        key = r["user_id"]
        img = (r["user_id"], r["grp"], r["value"], r["ver"], r["ets"])
        seq = r["_src"]["img_seq"]
        if r["op"] == "c":
            assert key not in live, f"insert on live key {key}"
            live[key] = img
        elif r["op"] == "d":
            n_del += 1
            assert live.pop(key) == img, f"delete before-image lies: {key}"
        else:  # 'u': img_seq 0 = before (true current row), 1 = after
            if seq == 0:
                n_upd += 1
                assert live.pop(key) == img, f"update before-image lies: {key}"
            else:
                assert key not in live
                live[key] = img
    assert n_upd > 0 and n_del > 0 and live


def test_keyed_fixture_exercises_fixed_semantics(keyed_rows):
    """NULL groups and PK-changing renames are genuinely present."""
    after_null_grp = [
        r for r in keyed_rows
        if r["op"] != "d" and r["_src"]["img_seq"] != 0 and r["grp"] is None
    ]
    renamed = [r for r in keyed_rows if r["user_id"] >= 1_000_000]
    assert len(after_null_grp) > 5
    assert len(renamed) > 5


def _run_agg(spark, env, outdir):
    from flink_cdc_log_connectors_spark.streaming.aggregates import (
        ChangelogAggregate,
    )

    agg = ChangelogAggregate(
        "state",
        _keyed_state_schema(),
        key="user_id",
        group_cols=["grp"],
        output_path=str(outdir),
        sum_cols=["value"],
        n_buckets=4,
    )
    _replay_keyed_batches(agg.process_batch, env)
    return {
        (r["grp"], r["cnt"], round(r["sum_value"], 2))
        for r in agg.read_view(spark).collect()
    }


def test_agg_witness_discriminates_r6_fixes(spark, sf_dir, tmp_path, monkeypatch):
    """Re-introducing either pre-r6 bug changes the maintained view —
    i.e. the driver oracle would go red on pre-fix machinery."""
    import flink_cdc_log_connectors_spark.streaming.aggregates as agg_mod

    env = _keyed_state_envelopes(spark, sf_dir)
    good = _run_agg(spark, env, tmp_path / "good")
    assert any(g is None for g, *_ in good), "NULL group must be populated"

    # pre-fix (a): UPDATE_BEFORE images dropped instead of retracted —
    # rename ghosts stay live under their old key and inflate groups.
    # The retraction is fused into parse_change_rows since r13, so the
    # pre-fix machinery is simulated by forcing retract=False there.
    import flink_cdc_log_connectors_spark.sources.debezium as dbz_mod

    real_parse = dbz_mod.parse_change_rows
    monkeypatch.setattr(
        agg_mod,
        "parse_change_rows",
        lambda df, physical, **kw: real_parse(
            df, physical, **{**kw, "retract": False}
        ),
    )
    ghosts = _run_agg(spark, env, tmp_path / "ghosts")
    monkeypatch.undo()
    assert ghosts != good

    # pre-fix (b): null-UNSAFE membership joins — the NULL group vanishes
    monkeypatch.setattr(
        agg_mod,
        "null_safe_on",
        lambda left, right, cols: functools.reduce(
            operator.and_, [left[c] == right[c] for c in cols]
        ),
    )
    nulllost = _run_agg(spark, env, tmp_path / "nulllost")
    monkeypatch.undo()
    assert not any(g is None for g, *_ in nulllost)
    assert nulllost != good


def test_ingest_dedup_retry_stable_and_oriented(spark, sf_dir, tmp_path):
    """The r8 epoch-filtered index read: re-delivering a committed epoch
    re-derives EXACTLY the original pair set (pre-fix, the retry joined
    its own re-appended index rows and emitted every intra-batch pair in
    BOTH orientations), and every pair is oriented by arrival (d1 = the
    later batch's doc; same batch → smaller id first)."""
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        IngestDedup,
        read_dedup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # threshold 2 → the index stores' auto-compaction fires mid-stream;
    # the retry below then runs AGAINST a folded index, proving the
    # fold preserves the __epoch stamps the replay discipline reads
    dd = IngestDedup(str(tmp_path / "idx"), compact_threshold=2)
    for epoch in range(3):
        dd.process_batch(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch_id=epoch
        )
    assert dd.bands.compactions_committed() >= 1
    for t in (dd.bands, dd.shsets, dd.pairs):
        lens = [
            len(v)
            for b, v in t.load_manifest().items()
            if not b.startswith("__")
        ]
        assert all(n <= 2 for n in lens), (t.path, lens)
    first = {
        (r["d1"], r["d2"]) for r in
        read_dedup_pairs(spark, str(tmp_path / "idx")).collect()
    }
    assert first, "fixture must produce near-dup pairs"
    for d1, d2 in first:
        b1, b2 = d1 % 3, d2 % 3
        assert b1 > b2 or (b1 == b2 and d1 < d2), (d1, d2)
    # retry of a committed epoch: the pair set must not change (the
    # append either no-ops — epoch subsumed by the fold — or overwrites
    # its own version with identical rows)
    dd.process_batch(docs.filter(F.col("doc_id") % 3 == 1), epoch_id=1)
    second = {
        (r["d1"], r["d2"]) for r in
        read_dedup_pairs(spark, str(tmp_path / "idx")).collect()
    }
    assert second == first


def test_sink_witness_matches_duckdb_oracle(spark, sf_dir):
    """sink_exactly_once_replay end to end (partial-write crash,
    duplicate epoch delivery, orphan GC) vs its dedup-free aggregation
    oracle — the same check selfcheck/driver run at sf0.01."""
    import duckdb

    from flink_cdc_log_connectors_spark.operators.replay import (
        SINK_EXACTLY_ONCE_REPLAY_SQL,
        sink_exactly_once_replay_query,
    )

    got = {
        tuple(r)
        for r in sink_exactly_once_replay_query(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(SINK_EXACTLY_ONCE_REPLAY_SQL).fetchall()
    }
    assert got == want


def test_agg_witness_matches_duckdb_oracle(spark, sf_dir):
    """Full engine-vs-oracle equivalence at test scale (the same check
    selfcheck/driver run at sf0.01)."""
    import duckdb

    from flink_cdc_log_connectors_spark.operators.replay import (
        CHANGELOG_AGG_REPLAY_SQL,
        changelog_agg_replay_query,
    )

    got = {tuple(r) for r in changelog_agg_replay_query(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = {tuple(r) for r in con.execute(CHANGELOG_AGG_REPLAY_SQL).fetchall()}
    assert got == want


def test_ingest_dedup_window_semantics_and_gc(spark, sf_dir, tmp_path):
    """retention_epochs=1: the windowed run's pairs are exactly the full
    run's pairs whose arrival batches are <= 1 apart (probe-side window
    filter — exact semantics), compactions physically drop index rows
    aged out of the latest window (bands keep no epoch-0 rows after the
    epoch-2 fold) while the pairs OUTPUT record keeps its epoch-0
    discoveries, and a re-delivery of the latest epoch re-derives the
    identical pair set."""
    from flink_cdc_log_connectors_spark.io import load_table
    from flink_cdc_log_connectors_spark.streaming.ingest_dedup import (
        IngestDedup,
        read_dedup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")

    def run(path, **kw):
        dd = IngestDedup(path, compact_threshold=2, **kw)
        for epoch in range(3):
            dd.process_batch(
                docs.filter(F.col("doc_id") % 3 == epoch), epoch_id=epoch
            )
        return dd

    full = run(str(tmp_path / "full"))
    win = run(str(tmp_path / "win"), retention_epochs=1)
    full_pairs = {
        (r["d1"], r["d2"])
        for r in read_dedup_pairs(spark, str(tmp_path / "full")).collect()
    }
    win_pairs = {
        (r["d1"], r["d2"])
        for r in read_dedup_pairs(spark, str(tmp_path / "win")).collect()
    }
    expected = {
        (d1, d2)
        for d1, d2 in full_pairs
        if abs(d1 % 3 - d2 % 3) <= 1
    }
    assert win_pairs == expected
    assert win_pairs < full_pairs, "fixture must have cross-window pairs"
    # physical GC: the epoch-2 fold dropped bands/shsets rows older than
    # the latest window; the pairs record never expires
    assert win.bands.compactions_committed() >= 1
    assert win.bands.read(spark).agg(F.min("__epoch")).first()[0] >= 1
    assert (
        read_dedup_pairs(spark, str(tmp_path / "win"))
        .filter(F.col("__epoch") == 0)
        .count()
        > 0
    )
    # latest-epoch re-delivery converges (its window is exactly what the
    # drop cutoff preserved)
    win.process_batch(docs.filter(F.col("doc_id") % 3 == 2), epoch_id=2)
    again = {
        (r["d1"], r["d2"])
        for r in read_dedup_pairs(spark, str(tmp_path / "win")).collect()
    }
    assert again == win_pairs
