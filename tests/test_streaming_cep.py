"""Streaming CEP (streaming/cep.py): patterns straddling microbatch
boundaries, state recovery across restarts, late-event accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_log_connectors_spark.streaming.cep import (
    streaming_adjacent_pattern,
)

PATTERN = ("view", "click", "purchase")


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "u long, ts_ms long, e string, tie long"
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(
        "u long, ts_ms long, e string, tie long"
    ).parquet(src)
    out = streaming_adjacent_pattern(
        stream, key="u", ts_ms_col="ts_ms", type_col="e",
        pattern=PATTERN, tie_col="tie",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def _read(spark, out_dir):
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:
        return []


def test_pattern_across_batch_boundary_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    # run 1: 'view click' only — no match yet, tail persists in state
    _write_batch(spark, src, [
        (1, 100, "view", 1), (1, 200, "click", 2),
        (2, 100, "view", 3),
    ])
    out = str(tmp_path / "out")
    _run(spark, src, ckpt, out)
    assert len(_read(spark, out)) == 0

    # run 2 (fresh query from the SAME checkpoint — state recovered):
    # the purchase completes user 1's pattern that began last run
    _write_batch(spark, src, [
        (1, 300, "purchase", 4),
        (2, 150, "click", 5), (2, 250, "purchase", 6),
    ])
    _run(spark, src, ckpt, out)
    rows = {
        (r["u"], r["start_ms"], r["end_ms"]) for r in _read(spark, out)
    }
    assert rows == {(1, 100, 300), (2, 100, 250)}


def test_overlapping_matches_within_one_batch(spark, tmp_path):
    src = str(tmp_path / "s2")
    ckpt = str(tmp_path / "ck2")
    _write_batch(spark, src, [
        (7, 10, "view", 1), (7, 20, "click", 2), (7, 30, "purchase", 3),
        (7, 40, "view", 4), (7, 50, "click", 5), (7, 60, "purchase", 6),
        (7, 70, "other", 7),
    ])
    out = str(tmp_path / "out2")
    _run(spark, src, ckpt, out)
    rows = sorted((r["start_ms"], r["end_ms"]) for r in _read(spark, out))
    assert rows == [(10, 30), (40, 60)]


def test_no_duplicate_emission_for_tail_matches(spark, tmp_path):
    """A match fully contained in the stored tail must not re-emit when
    later events arrive."""
    src = str(tmp_path / "s3")
    ckpt = str(tmp_path / "ck3")
    _write_batch(spark, src, [
        (5, 10, "view", 1), (5, 20, "click", 2), (5, 30, "purchase", 3),
    ])
    out = str(tmp_path / "out3")
    _run(spark, src, ckpt, out)
    assert len(_read(spark, out)) == 1
    _write_batch(spark, src, [(5, 40, "other", 4)])
    _run(spark, src, ckpt, out)
    assert len(_read(spark, out)) == 1  # nothing new


def test_late_events_counted_not_silent(spark, tmp_path):
    src = str(tmp_path / "s4")
    ckpt = str(tmp_path / "ck4")
    _write_batch(spark, src, [
        (9, 100, "view", 1), (9, 200, "click", 2),
    ])
    out = str(tmp_path / "out4")
    _run(spark, src, ckpt, out)
    # a contract-violating late event (ts before the stored tail) is
    # dropped but surfaces in n_late on the batch's emitted rows
    _write_batch(spark, src, [
        (9, 50, "view", 3),          # late
        (9, 300, "purchase", 4),     # completes the pattern
    ])
    _run(spark, src, ckpt, out)
    rows = _read(spark, out)
    assert len(rows) == 1
    assert rows[0]["n_late"] == 1
    assert (rows[0]["start_ms"], rows[0]["end_ms"]) == (100, 300)


def test_late_drops_with_no_match_carry_to_next_emission(spark, tmp_path):
    """ADVICE r3: a batch that drops late events but finds no matches must
    not lose the count — it accumulates in keyed state and rides out on
    the key's next emitted row."""
    src = str(tmp_path / "s5")
    ckpt = str(tmp_path / "ck5")
    _write_batch(spark, src, [
        (3, 100, "view", 1), (3, 200, "click", 2),
    ])
    out = str(tmp_path / "out5")
    _run(spark, src, ckpt, out)
    # batch 2: TWO late events, NO match completed -> nothing emitted
    _write_batch(spark, src, [
        (3, 10, "view", 3), (3, 20, "click", 4),
    ])
    _run(spark, src, ckpt, out)
    assert len(_read(spark, out)) == 0
    # batch 3: pattern completes; the pending late count surfaces here
    _write_batch(spark, src, [(3, 300, "purchase", 5)])
    _run(spark, src, ckpt, out)
    rows = _read(spark, out)
    assert len(rows) == 1
    assert rows[0]["n_late"] == 2
    # batch 4: another full match, pending was drained by the emission
    _write_batch(spark, src, [
        (3, 400, "view", 6), (3, 500, "click", 7), (3, 600, "purchase", 8),
    ])
    _run(spark, src, ckpt, out)
    rows = sorted(_read(spark, out), key=lambda r: r["end_ms"])
    assert len(rows) == 2
    assert rows[1]["n_late"] == 0
