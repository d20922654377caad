"""Corpus-size-driven LSH band planning (the SCALING.md saturation fix,
wired as the default path).

Narrow fixed bands saturate: with w-bit bands, random band collisions grow
~n²/2^w, measured 5.3–6.0× wall-clock at 10× on the 15-bit simhash default
vs 3.2× on the 30-bit wide variant.  The planners compute w ≈ log2(n) and
the default entry points (simhash_dedup_auto, lsh_cosine_pairs with
plane_bits=None) act on it; the oracle-checked registry entries pin fixed
widths so checked results never depend on corpus size.
"""

import pytest

from flink_cdc_log_connectors_spark.io import load_table
from flink_cdc_log_connectors_spark.operators.dedup import (
    SIMHASH_BAND_BITS,
    simhash_band_bits,
    simhash_dedup_auto,
    simhash_dedup_verdict,
    simhash_wide_dedup_verdict,
)
from flink_cdc_log_connectors_spark.operators.similarity import (
    LSH_BANDS,
    PLANE_BITS,
    lsh_band_values,
    lsh_cosine_pairs,
    lsh_plane_bits,
    lsh_signature,
)


def test_simhash_band_bits_pinned_values():
    assert simhash_band_bits(1) == 8
    assert simhash_band_bits(500) == 9          # sf0.01 documents
    assert simhash_band_bits(2**15) == 15       # the measured saturation knee
    assert simhash_band_bits(2**15 + 1) == 16   # first corpus that goes wide
    assert simhash_band_bits(10**9) == 30
    assert simhash_band_bits(2**80) == 60       # clamp


def test_lsh_plane_bits_pinned_values():
    assert lsh_plane_bits(1) == PLANE_BITS
    assert lsh_plane_bits(200) == PLANE_BITS    # log2 < 8 → keep default
    assert lsh_plane_bits(10**6) == 20
    assert lsh_plane_bits(2**40) == 24          # clamp: recall falls as p^w


def test_lsh_plan_properties():
    """lsh_plan invariants for arbitrary thresholds/widths: returns a
    divisor factorization, the achieved threshold is the true S-curve
    value, and no other factorization lands closer to the request."""
    from hypothesis import given, strategies as st

    from flink_cdc_log_connectors_spark.operators.dedup import lsh_plan

    @given(
        st.floats(min_value=0.01, max_value=0.99),
        st.sampled_from([8, 16, 32, 64, 128]),
    )
    def check(threshold, n_hashes):
        b, r, t = lsh_plan(threshold, n_hashes)
        assert b * r == n_hashes
        assert abs(t - (1.0 / b) ** (1.0 / r)) < 1e-12
        for r2 in range(1, n_hashes + 1):
            if n_hashes % r2:
                continue
            t2 = (1.0 / (n_hashes // r2)) ** (1.0 / r2)
            assert abs(t - threshold) <= abs(t2 - threshold) + 1e-12

    check()


def test_band_bits_planners_monotone():
    """Both width planners are monotone in corpus size and clamped —
    a bigger corpus never gets a narrower band."""
    from flink_cdc_log_connectors_spark.operators.dedup import (
        simhash_band_bits,
    )

    prev_s = prev_p = 0
    for n in (1, 10, 100, 10**3, 10**4, 10**5, 10**6, 10**9, 10**12, 2**99):
        s, p = simhash_band_bits(n), lsh_plane_bits(n)
        assert s >= prev_s and p >= prev_p
        assert 8 <= s <= 60 and PLANE_BITS <= p <= 24
        prev_s, prev_p = s, p


def test_minhash_bands_planned_from_threshold(spark, sf_dir):
    """minhash_dedup_pairs defaults its banding from the VERIFY threshold
    via lsh_plan: at the registry's 0.2 threshold the planner picks 16×2
    (S-curve 0.25) over the historical 8×4 (0.59) — and planned
    candidates are a SUPERSET at the low threshold, so every pinned-band
    verified pair survives (verification is exact either way)."""
    from flink_cdc_log_connectors_spark.operators.dedup import (
        BANDS,
        NUM_HASHES,
        lsh_plan,
        minhash_dedup_pairs,
    )

    assert lsh_plan(0.2, NUM_HASHES)[:2] == (16, 2)
    assert lsh_plan(0.59, NUM_HASHES)[:2] == (8, 4)
    # high thresholds would plan r=8+ unconstrained, which the 15-bit
    # band packing cannot hold in a 64-bit bucket — the default path
    # plans under max_rows_per_band=4 and gets the widest representable
    # geometry instead of an unpackable one (pre-fix: F.lit(1<<105)
    # AssertionError deep in plan construction)
    assert lsh_plan(0.75, NUM_HASHES)[:2] == (4, 8)
    assert lsh_plan(0.75, NUM_HASHES, max_rows_per_band=4)[:2] == (8, 4)

    docs = load_table(spark, sf_dir, "documents").limit(60)
    pinned = {
        (r.d1, r.d2)
        for r in minhash_dedup_pairs(docs, bands=BANDS).collect()
    }
    planned = {
        (r.d1, r.d2) for r in minhash_dedup_pairs(docs).collect()
    }
    # 16×2 bands are unions of 8×4 bands' rows? No — but every pair that
    # agrees on one 4-row band agrees on both its 2-row halves, so the
    # planned (2-row) candidate set contains the pinned (4-row) one.
    assert pinned <= planned

    # the high-threshold default path must not crash (plans 8×4 under the
    # packing cap, not the unpackable 4×8)
    high = minhash_dedup_pairs(
        docs.limit(20), threshold_num=3, threshold_den=4
    ).collect()
    assert isinstance(high, list)

    import pytest

    from flink_cdc_log_connectors_spark.operators.dedup import (
        _band_bucket,
        _minhash_sql,
    )

    with pytest.raises(ValueError, match="at most 4 rows"):
        _band_bucket(0, rows_per_band=8)
    with pytest.raises(ValueError, match="at most 4 rows"):
        _minhash_sql(bands=4)


def test_auto_picks_narrow_then_wide(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    narrow = {
        tuple(r)
        for r in simhash_dedup_auto(docs, expected_docs=1000).collect()
    }
    assert narrow == {
        tuple(r) for r in simhash_dedup_verdict(docs).collect()
    }
    wide = {
        tuple(r)
        for r in simhash_dedup_auto(docs, expected_docs=2**20).collect()
    }
    assert wide == {
        tuple(r) for r in simhash_wide_dedup_verdict(docs).collect()
    }
    # both geometries carry the pigeonhole guarantee, so exact dups (and
    # everything at Hamming ≤ 3) agree between plans; schema is identical
    assert {r[0] for r in narrow} == {r[0] for r in wide}


def test_band_values_match_packed_signature(spark, sf_dir):
    """For the default 8×8 geometry the array-banded signature must be
    bit-identical to slicing the packed 64-bit signature — widening is a
    superset change, not a fork."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    both = emb.select(
        lsh_signature(F.col("embedding")).alias("sig"),
        lsh_band_values(F.col("embedding"), LSH_BANDS, PLANE_BITS).alias("bv"),
    ).collect()
    assert both
    mask = (1 << PLANE_BITS) - 1
    for row in both:
        packed = [(row.sig >> (PLANE_BITS * k)) & mask for k in range(LSH_BANDS)]
        assert packed == list(row.bv)


def test_wide_plane_path_exact_and_finds_identicals(spark, sf_dir):
    """plane_bits > 8 exercises the array path: precision stays exact
    (every emitted pair re-verified ≥ min_sim) and identical vectors are
    always recalled (equal vectors ⇒ equal band values in any geometry)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    # plant an exact duplicate pair with out-of-range ids
    dup = emb.limit(1).select(
        F.lit(10_000_001).alias("vec_id"),
        *[F.col(c) for c in emb.columns if c != "vec_id"],
    ).select(*emb.columns)
    dup2 = dup.withColumn("vec_id", F.lit(10_000_002))
    corpus = emb.unionByName(dup).unionByName(dup2)
    pairs = lsh_cosine_pairs(corpus, min_sim=0.4, plane_bits=12).collect()
    assert all(r.sim >= 0.4 for r in pairs)
    assert any(
        {r.d1, r.d2} == {10_000_001, 10_000_002} for r in pairs
    ), "identical vectors must collide in every band"


def test_default_is_planner_driven(spark, sf_dir):
    """plane_bits=None (the default) must route through the planner: at
    fixture scale lsh_plane_bits(n) == PLANE_BITS, so the default plan
    equals the pinned-8 plan; a forced large expected_docs must change
    the signature stage to the array path."""
    emb = load_table(spark, sf_dir, "embeddings").limit(32)
    default_pairs = {
        (r.d1, r.d2) for r in lsh_cosine_pairs(emb, min_sim=0.4).collect()
    }
    pinned_pairs = {
        (r.d1, r.d2)
        for r in lsh_cosine_pairs(
            emb, min_sim=0.4, plane_bits=PLANE_BITS
        ).collect()
    }
    assert default_pairs == pinned_pairs
    # forcing a large expected_docs must route to the array-banded
    # signature (wider bands) — the analyzed plan carries the array column
    wide = lsh_cosine_pairs(emb, min_sim=0.4, expected_docs=10**6)
    assert lsh_plane_bits(10**6) == 20
    assert "array" in wide._jdf.queryExecution().analyzed().toString().lower()
    assert all(r.sim >= 0.4 for r in wide.collect())


def test_lsh_candidates_rejects_invalid_bands(spark):
    """ADVICE r6: a non-divisor band count silently banded over
    fewer/misaligned hash columns (and bands > NUM_HASHES crashed
    obscurely); now both raise up front, before any plan is built."""
    import pytest

    from flink_cdc_log_connectors_spark.operators.dedup import (
        NUM_HASHES,
        lsh_candidates,
    )

    sig = spark.createDataFrame([(1,)], "doc_id long")
    for bad in (0, -1, 3, NUM_HASHES - 1, NUM_HASHES + 1, 2 * NUM_HASHES):
        with pytest.raises(ValueError, match="divisor"):
            lsh_candidates(sig, bands=bad)
    assert NUM_HASHES % 3 != 0 and NUM_HASHES % (NUM_HASHES - 1) != 0
