"""Unit tests for the r5 operators: triangle census, two-phase reservoir
top-k, bigram LM estimation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant edge: 4 triangles, wedges counted on undirected
    degrees, coefficient = 3·4/13."""
    from flink_cdc_log_connectors_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        k4 + [(3, 9), (9, 3), (2, 1)],  # dup + reversed dup must collapse
        "d1 long, d2 long",
    )
    row = triangle_count(edges).first()
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    # degrees: 3,3,3,4,1 → wedges 3+3+3+6+0 = 15
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert math.isclose(row["clustering_coeff"], 12 / 15)


def test_triangle_count_no_triangles(spark):
    from flink_cdc_log_connectors_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "d1 long, d2 long"
    )
    row = triangle_count(edges).first()
    assert row["n_triangles"] == 0
    assert row["clustering_coeff"] == 0.0


def test_reservoir_two_phase_equals_naive(spark):
    """The salted two-phase top-k must equal the single-window per-source
    top-k on the real documents table."""
    from flink_cdc_log_connectors_spark.operators.curation import (
        RESERVOIR_K,
        reservoir_topk_query,
    )
    from flink_cdc_log_connectors_spark.io import load_table
    from pyspark.sql.window import Window

    sf = "/root/testdata/sf0.001"
    got = [
        (r["source"], r["rank"], r["doc_id"])
        for r in reservoir_topk_query(spark, sf).collect()
    ]
    docs = load_table(spark, sf, "documents")
    pr = docs.select(
        "source",
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) "
            "div greatest(n_chars, 1)"
        ).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    naive = [
        (r["source"], r["rank"], r["doc_id"])
        for r in pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= RESERVOIR_K)
        .orderBy("source", "rank")
        .collect()
    ]
    assert got == naive and len(got) > 0


def test_bigram_lm_tiny_corpus(spark):
    """Hand-checked counts and smoothing on a 3-doc corpus."""
    from flink_cdc_log_connectors_spark.operators.lm import bigram_lm

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a cat sat")],
        "doc_id long, text string",
    )
    rows = {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["p_smoothed"])
        for r in bigram_lm(docs, min_count=1).collect()
    }
    # V = {the, cat, sat, ran, a} = 5; c(cat·)=3, c(the·)=2, c(a·)=1
    assert rows[("the", "cat")] == (2, 2, (2 + 1) / (2 + 5))
    assert rows[("cat", "sat")] == (2, 3, (2 + 1) / (3 + 5))
    assert rows[("cat", "ran")] == (1, 3, (1 + 1) / (3 + 5))
    assert rows[("a", "cat")] == (1, 1, (1 + 1) / (1 + 5))
    assert len(rows) == 4


def test_chunk_windows_shapes(spark):
    """Hand-checked chunking: strides, partial tail window, short doc,
    empty doc dropped."""
    from flink_cdc_log_connectors_spark.operators.curation import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(150))),  # 150 tokens
            (2, "only three tokens"),
            (3, "   "),  # tokenizes to nothing -> dropped
        ],
        "doc_id long, text string",
    )
    rows = chunk_windows(docs, size=64, stride=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start"], r["n_tokens"])
        )
    # doc 1: starts 0,32,64,96,128 -> lengths 64,64,64,54,22
    assert sorted(by_doc[1]) == [
        (0, 0, 64), (1, 32, 64), (2, 64, 64), (3, 96, 54), (4, 128, 22)
    ]
    assert sorted(by_doc[2]) == [(0, 0, 3)]
    assert 3 not in by_doc
    # chunk hash is the md5 of the window text
    import hashlib

    first = next(r for r in rows if r["doc_id"] == 2)
    assert first["chunk_hash"] == hashlib.md5(
        b"only three tokens"
    ).hexdigest()


def test_bigram_counts_short_docs_no_crash(spark):
    """Docs with 0 or 1 tokens must contribute nothing (regression: the
    unguarded sequence(0, -1) generated a DESCENDING index list and
    indexed out of bounds on 1-token docs)."""
    from flink_cdc_log_connectors_spark.operators.lm import bigram_counts

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "   "), (4, "two tokens")],
        "doc_id long, text string",
    )
    rows = {(r["w1"], r["w2"]): r["c12"] for r in bigram_counts(docs).collect()}
    assert rows == {("two", "tokens"): 1}


def test_stupid_backoff_tiers(spark):
    """All three backoff tiers hand-checked on a tiny corpus."""
    from flink_cdc_log_connectors_spark.operators.lm import (
        SB_ALPHA,
        stupid_backoff_query,
    )
    import flink_cdc_log_connectors_spark.operators.lm as lm
    from unittest import mock

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "b c d")],
        "doc_id long, text string",
    )
    with mock.patch.object(lm, "load_table", lambda s, d, n: docs), \
         mock.patch.object(lm, "SB_TOP_UNIGRAMS", 4):
        rows = {
            (r["w1"], r["w2"], r["w3"]): (r["c123"], r["score"])
            for r in stupid_backoff_query(spark, "unused").collect()
        }
    # tokens: a:2 b:3 c:2 d:2, N=9; bigrams: ab:2 bc:2 cd:1 bd:1
    # trigram tier: c(abc)=1, c(ab)=2 -> 0.5
    assert rows[("a", "b", "c")] == (1, 0.5)
    # bigram tier: an unseen trigram whose (w2,w3) bigram IS seen:
    # (c, b, c): c(cbc)=0 -> 0.4 * c(bc)/c(b)
    assert rows[("c", "b", "c")] == (0, SB_ALPHA * 2 / 3)
    # unigram tier: (a, a, a): c(aaa)=0, c(aa)=0 -> 0.4*(0.4*c(a)/N)
    # (association mirrors the engine expression exactly: the outer
    # alpha multiplies the already-computed bigram-tier score)
    assert rows[("a", "a", "a")] == (0, SB_ALPHA * (SB_ALPHA * 2 / 9))
    assert len(rows) == 64


def test_snapshot_diff_statuses(spark):
    """Hand-checked diff ledger on a 5-doc pair of snapshots."""
    from flink_cdc_log_connectors_spark.operators.curation import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "s", "alpha"), (2, "s", "beta"), (3, "t", "gamma"),
         (4, "t", "delta")],
        "doc_id long, source string, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "s", "alpha"), (2, "s", "beta CHANGED"), (4, "t", "delta"),
         (5, "t", "epsilon")],
        "doc_id long, source string, text string",
    )
    rows = {
        (r["source"], r["status"]): (r["n_docs"], r["chars_delta"])
        for r in snapshot_diff(v1, v2).collect()
    }
    assert rows[("s", "unchanged")] == (1, 0)
    assert rows[("s", "modified")] == (1, len("beta CHANGED") - len("beta"))
    assert rows[("t", "removed")] == (1, -len("gamma"))
    assert rows[("t", "added")] == (1, len("epsilon"))
    assert rows[("t", "unchanged")] == (1, 0)
    assert len(rows) == 5


def test_phash_identical_and_noisy_assets(spark):
    """aHash near-dup detection: identical payloads -> hamming 0; a
    payload with one flipped region stays within the threshold; an
    unrelated payload does not pair."""
    from flink_cdc_log_connectors_spark.operators.multimodal import (
        phash_near_pairs,
    )

    base = "".join(chr(97 + (i * 7) % 26) for i in range(256))  # 16x16 grid
    noisy = "Z" + base[1:]  # one corner byte changed
    other = "".join(chr(97 + (i * 11 + 5) % 26) for i in range(256))
    assets = spark.createDataFrame(
        [(1, bytearray(base.encode())), (2, bytearray(base.encode())),
         (3, bytearray(noisy.encode())), (4, bytearray(other.encode()))],
        "asset_id long, payload binary",
    )
    rows = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in phash_near_pairs(assets).collect()
    }
    assert rows[(1, 2)] == 0
    assert rows.get((1, 3), 99) <= 6  # single-byte corner change
    assert (1, 4) not in rows and (2, 4) not in rows and (3, 4) not in rows


def test_ahash_band_keys_nonnegative_with_sign_bit(spark):
    """Regression: a hash with bit 63 set (negative int64) must still
    produce band keys in [0, 65535] — sign-following % gave a NEGATIVE
    top-band key that could never match a positive key with identical
    band bits."""
    from flink_cdc_log_connectors_spark.operators.multimodal import (
        ahash_assets,
    )

    # bright first thumbnail pixel, dark rest -> bit 63 (p=0) set
    grid = bytearray([255] + [0] * 255)
    assets = spark.createDataFrame(
        [(1, grid), (2, bytearray([0] * 128 + [255] + [0] * 127))],
        "asset_id long, payload binary",
    )
    rows = ahash_assets(assets).collect()
    assert any(r["hash"] < 0 for r in rows)  # the sign bit case is real
    for r in rows:
        for i in range(4):
            assert 0 <= r[f"b{i}"] <= 0xFFFF, (r["asset_id"], i, r[f"b{i}"])


def test_sequence_pack_invariants(spark):
    """Packing manifest invariants: per shard (ordered by doc_id) the
    offsets are the exact running token sum, every doc's sequence range
    covers its tokens, and no token is lost or double-assigned."""
    from flink_cdc_log_connectors_spark.operators.lm import sequence_pack

    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 40)))
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sequence_pack(docs, context_len=64, n_shards=4).collect()
    by_shard = {}
    for r in sorted(got, key=lambda r: (r["shard"], r["doc_id"])):
        off = by_shard.get(r["shard"], 0)
        assert r["seq_offset"] == off % 64
        assert r["start_seq"] == off // 64
        assert r["end_seq"] == (off + r["n_tokens"] - 1) // 64
        assert r["shard"] == r["doc_id"] % 4
        by_shard[r["shard"]] = off + r["n_tokens"]
    # token conservation: shard totals equal the input's token counts
    want = {}
    for i, text in rows:
        want[i % 4] = want.get(i % 4, 0) + len(text.split())
    assert by_shard == want


def test_pack_shard_audit_is_rollup_of_doc_manifest(spark, sf_dir):
    """corpus_pack_sequences (per-shard audit) must be exactly GROUP BY
    shard over lm_sequence_pack (per-doc manifest) — the two registry
    entries are grains of ONE placement, mutually checking."""
    from pyspark.sql import functions as F

    from flink_cdc_log_connectors_spark.operators.curation import (
        PACK_CAP,
        pack_sequences_query,
    )
    from flink_cdc_log_connectors_spark.operators.lm import (
        sequence_pack_query,
    )

    manifest = sequence_pack_query(spark, sf_dir)
    rolled = (
        manifest.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (F.max("end_seq") + 1).cast("long").alias("n_seqs"),
            F.sum((F.col("end_seq") > F.col("start_seq")).cast("long"))
            .cast("long")
            .alias("n_spanning"),
            ((F.max("end_seq") + 1) * PACK_CAP - F.sum("n_tokens"))
            .cast("long")
            .alias("pad_tokens"),
        )
        .orderBy("shard")
    )
    audit = pack_sequences_query(spark, sf_dir)
    assert [tuple(r) for r in rolled.collect()] == [
        tuple(r) for r in audit.collect()
    ]
