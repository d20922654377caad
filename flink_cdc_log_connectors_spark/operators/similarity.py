"""Similarity search over embedding columns (``array<float>``).

Three strategies:

- **Brute-force cosine top-k** — the exactness baseline.  The query set is
  broadcast (tiny), so the plan is a map-only pass over the candidate side:
  no shuffle of the big table, linear scale-out with partitions.
- **IVF by cluster id** — probe only candidates in the query's cell
  (here the pre-assigned ``label`` column plays the IVF cell id, as a
  k-means assignment would at scale).  Turns the cross product into an
  equi-join on the cell key.
- **Sign-LSH (random hyperplanes)** — 16-bit sign signatures, banded
  bucket join for candidates, exact cosine re-verification.  The 100 TB
  path: candidate generation never materializes the full cross product.

Determinism discipline: similarity scoring runs as Arrow-batched BLAS
matmuls (``mapInPandas``/``pandas_udf`` — the 100 TB hot path; one
``B×D @ D×Q`` per batch instead of per-pair expression evaluation, ~10×
measured).  BLAS summation order differs from a sequential fold, so all
REPORTED similarities are rounded to 6 decimals and every threshold/rank
is applied to the ROUNDED value; the DuckDB oracles round identically,
making comparison and ranking cross-engine deterministic at 1e-6 grain
(sequential-fold helpers ``seq_dot``/``cosine`` remain for callers that
need bit-exact doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

DIM = 64


def seq_dot(a: Column, b: Column) -> Column:
    """Sequential (left-to-right) double dot product of two float arrays.

    The ``zip_with`` + ``aggregate`` fold is the measured fastest exact
    form: an unrolled 64-term ``a[0]*b[0] + …`` sum was tried and is ~4×
    SLOWER (per-element ``getItem`` null checks defeat codegen), and numpy
    batch dots change IEEE summation order and break oracle bit-equality.
    """
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return seq_dot(a, b) / (F.sqrt(norm_a) * F.sqrt(norm_b))


def _dot_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB fragment: the same sequential double dot product."""
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("norm2", seq_dot(F.col(vec_col), F.col(vec_col)))


def _collect_query_matrix(queries: DataFrame, vec_col: str, id_col: str):
    """Driver-side materialization of the (small) query set: ids, a
    DIM×Q float64 matrix, and per-query L2 norms.  This is the broadcast
    side of the search — at 100 TB the candidate scan is the big side and
    the query set stays a plan constant shipped with the task closure."""
    import numpy as np

    rows = queries.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    qm = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
    return ids, qm.T, np.sqrt((qm * qm).sum(axis=1))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast query matrix × map-side scan of
    candidates, one BLAS ``B×D @ D×Q`` matmul per Arrow batch
    (``mapInPandas``) — no shuffle of the candidate side; the only shuffle
    is the tiny scored set into the per-query top-k window.  Similarities
    are rounded to 6 decimals (BLAS summation order differs from a
    sequential fold) and ranked on the rounded value with ``neighbor_id``
    tiebreak, so ranks are cross-engine deterministic."""
    import numpy as np
    import pandas as pd

    q_ids, qmat_t, q_norms = _collect_query_matrix(queries, vec_col, id_col)
    nq = len(q_ids)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ qmat_t) / np.outer(norms, q_norms)
            cand_ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, len(pdf)),
                    "neighbor_id": np.repeat(cand_ids, nq),
                    "sim": np.round(sims.ravel(), 6),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = candidates.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def ann_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(queries, emb, k=10).orderBy("query_id", "rk")


_DOT_AB = _dot_sql("a.embedding", "b.embedding")
_NORM = _dot_sql("embedding", "embedding")

ANN_TOPK_SQL = f"""
WITH n AS (SELECT vec_id, embedding, {_NORM} AS norm2 FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_AB} / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
  FROM n a JOIN n b ON a.vec_id < 8 AND b.vec_id != a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, sim, rk FROM ranked
WHERE rk <= 10 ORDER BY query_id, rk
"""


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: each query scores only candidates in its own cell.
    Same broadcast-queries + map-side BLAS scan as ``brute_force_topk``,
    with a cell-membership mask instead of an equi-join — the candidate
    side is never shuffled (or is pre-bucketed by cell at scale, making
    the probe partition-pruned)."""
    import numpy as np
    import pandas as pd

    rows = queries.select(id_col, cell_col, vec_col).collect()
    q_ids = np.array([r[0] for r in rows], dtype="int64")
    q_cells = np.array([r[1] for r in rows], dtype="int64")
    qm = np.stack([np.asarray(r[2], dtype="float64") for r in rows])
    qmat_t, q_norms = qm.T, np.sqrt((qm * qm).sum(axis=1))
    nq = len(q_ids)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ qmat_t) / np.outer(norms, q_norms)
            cand_ids = pdf[id_col].to_numpy()
            cand_cells = pdf[cell_col].to_numpy()
            out = pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, len(pdf)),
                    "neighbor_id": np.repeat(cand_ids, nq),
                    "same_cell": (cand_cells[:, None] == q_cells[None, :]).ravel(),
                    "sim": np.round(sims.ravel(), 6),
                }
            )
            yield out[out.same_cell & (out.query_id != out.neighbor_id)][
                ["query_id", "neighbor_id", "sim"]
            ]

    scored = candidates.select(id_col, cell_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(queries, emb, k=3).orderBy("query_id", "rk")


ANN_IVF_SQL = f"""
WITH n AS (SELECT vec_id, label, embedding, {_NORM} AS norm2 FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_AB} / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
  FROM n a JOIN n b ON a.vec_id < 8 AND b.label = a.label AND b.vec_id != a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, sim, rk FROM ranked
WHERE rk <= 3 ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# Sign-LSH: hyperplane signatures → banded candidates → exact verify
# --------------------------------------------------------------------------

# 64 planes in 8 bands of 8 bits: ~0.4% random band-collision rate
# (2^-8 × 8) yet ~93% recall for 0.9-cosine pairs — with 4-bit bands the
# candidate set was 24% of the full cross product (measured), defeating
# the point of LSH.
NUM_PLANES = 64
LSH_BANDS = 8
PLANE_BITS = NUM_PLANES // LSH_BANDS


def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1): md5-seeded,
    computed once on the driver — the plan carries plain double literals."""
    import hashlib

    h = int.from_bytes(hashlib.md5(f"plane:{p}:{d}".encode()).digest()[:8], "big")
    return (h % 2_000_003) / 1_000_001.5 - 1.0


#: driver-side constant hyperplanes (NUM_PLANES × DIM doubles)
_PLANES = [[_plane_weight(p, d) for d in range(DIM)] for p in range(NUM_PLANES)]


def lsh_signature(vec_col: Column) -> Column:
    """16-bit sign signature: bit p = sign(dot(vec, plane_p)) > 0.

    Arrow-batched Pandas UDF doing ONE numpy matmul per batch (B×64 @
    64×16) — candidate generation only, so BLAS summation order is fine;
    exact cosine re-verification downstream uses the sequential path.
    """
    import numpy as np
    import pandas as pd

    planes_t = [list(row) for row in zip(*_PLANES)]  # DIM × NUM_PLANES

    def _sig(emb):
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack(emb.to_numpy()).astype(np.float64)
        dots = m @ np.asarray(planes_t)
        bits = (dots > 0).astype(np.int64)
        sig = (bits << np.arange(bits.shape[1], dtype=np.int64)).sum(axis=1)
        return pd.Series(sig)

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify hints, which pandas_udf inference cannot resolve here
    _sig.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    sig_udf = F.pandas_udf(_sig, "long")
    return sig_udf(vec_col)


def lsh_plane_bits(expected_docs: int) -> int:
    """Planes-per-band for sign-LSH at a given corpus size — the same
    ``n²/2^w`` random-collision argument as ``dedup.simhash_band_bits``
    (expected random band collisions stay O(n) when ``w ≥ log2 n``).
    Clamped to [PLANE_BITS, 24]: true-pair recall falls as ``p^w`` with
    band width, so never widen past what the corpus size demands."""
    import math

    if expected_docs < 2:
        return PLANE_BITS
    return max(PLANE_BITS, min(24, math.ceil(math.log2(expected_docs))))


def lsh_band_values(
    vec_col: Column, n_bands: int = LSH_BANDS, plane_bits: int = PLANE_BITS
) -> Column:
    """Sign-LSH band values as ``array<long>`` (``n_bands`` entries) —
    the width-parameterized generalization of :func:`lsh_signature`,
    free of the 64-bit packing cap (``n_bands × plane_bits`` can exceed
    one long).  Plane ``p = k·plane_bits + j`` contributes bit ``j`` of
    band ``k``; for the default 8×8 geometry the band values are
    bit-identical to slicing the packed signature, so widening is a pure
    superset change.  One numpy matmul per Arrow batch, map-only."""
    import numpy as np
    import pandas as pd

    n_planes = n_bands * plane_bits
    planes_t = [
        [_plane_weight(p, d) for p in range(n_planes)] for d in range(DIM)
    ]  # DIM × n_planes

    def _bands(emb):
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (m @ np.asarray(planes_t) > 0).astype(np.int64)  # B × n_planes
        weights = np.int64(1) << (np.arange(n_planes, dtype=np.int64) % plane_bits)
        vals = (bits * weights).reshape(len(m), n_bands, plane_bits).sum(axis=2)
        return pd.Series(list(vals))

    _bands.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(_bands, "array<long>")(vec_col)


def lsh_cosine_pairs(
    df: DataFrame,
    min_sim: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    plane_bits: int | None = None,
    expected_docs: int | None = None,
) -> DataFrame:
    """Near-dup pairs by sign-LSH banding + exact cosine verification.
    Probabilistic recall (banding); exact precision (re-verified).

    Shuffle discipline: the band self-join runs on SKINNY rows
    (id, band_idx, band_value) — 20 bytes, not the 64-float vectors; the
    vectors join in only after candidate pairs are deduplicated, so each
    vector crosses the exchange once per side of the (small) candidate
    set instead of 8× through the band explode.  The signature UDF pass
    is persisted (it feeds both join sides).

    Band width: ``plane_bits=None`` (the default) sizes bands from the
    corpus via :func:`lsh_plane_bits` — ``expected_docs`` skips the
    sizing ``count()`` when the caller knows the cardinality.  Pass an
    explicit ``plane_bits`` to pin the geometry (the oracle-checked
    registry entry pins 8 so checked results never depend on corpus
    size); widths beyond 8 use the array-banded signature
    (:func:`lsh_band_values`) — identical plane indexing, no 64-bit
    packing cap.
    """
    from ..caching import persist_tracked

    if plane_bits is None:
        n = expected_docs if expected_docs is not None else df.count()
        plane_bits = lsh_plane_bits(n)
    if plane_bits == PLANE_BITS:
        sigs = persist_tracked(
            df.select(
                F.col(id_col).alias("doc_id"),
                lsh_signature(F.col(vec_col)).alias("sig"),
            )
        )
        bands = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("k"),
                            F.shiftrightunsigned(F.col("sig"), PLANE_BITS * k)
                            .bitwiseAND(F.lit((1 << PLANE_BITS) - 1))
                            .alias("band"),
                        )
                        for k in range(LSH_BANDS)
                    ]
                )
            ).alias("e"),
        ).select("doc_id", "e.k", "e.band")
    else:
        sigs = persist_tracked(
            df.select(
                F.col(id_col).alias("doc_id"),
                lsh_band_values(F.col(vec_col), LSH_BANDS, plane_bits).alias(
                    "bv"
                ),
            )
        )
        bands = sigs.select("doc_id", F.posexplode("bv").alias("k", "band"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .dropDuplicates(["d1", "d2"])
    )
    vecs = with_norm(df, vec_col).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.col("norm2").alias("nn"),
    )
    v1 = vecs.alias("v1")
    v2 = vecs.alias("v2")
    # HOF cosine, not a Pandas UDF: a per-pair UDF would ship BOTH 64-float
    # vectors per candidate pair through Arrow — measured slower than the
    # codegen'd fold.  (Gram-matrix scoring wins only where each vector
    # crosses the boundary once: applyInPandas/mapInPandas on rows.)
    return (
        cand.join(v1, F.col("d1") == F.col("v1.vid"))
        .join(v2, F.col("d2") == F.col("v2.vid"))
        .withColumn(
            "sim",
            cosine(F.col("v1.v"), F.col("v2.v"), F.col("v1.nn"), F.col("v2.nn")),
        )
        .filter(F.col("sim") >= min_sim)
        .select("d1", "d2", "sim")
    )


def simsearch_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # plane_bits pinned: the oracle re-derives the 8×8 geometry in SQL, so
    # the checked result must not float with corpus size (the planner
    # default is exercised by tests/test_plans.py + the 10× scale smoke).
    return lsh_cosine_pairs(emb, min_sim=0.4, plane_bits=PLANE_BITS).orderBy(
        "d1", "d2"
    )


def _lsh_cosine_sql(
    plane_bits: int = PLANE_BITS, n_bands: int = LSH_BANDS
) -> str:
    """DuckDB twin of the FULL sign-LSH pipeline, parameterized by band
    geometry.  The hyperplanes are md5-seeded (``_plane_weight``), so the
    oracle re-derives the SAME weights from the same formula in SQL — no
    plane literals shipped, for ANY plane count (the wide entry uses
    planes the packed 64-bit signature can't hold).  Band values are
    built directly from the per-plane sign bits (band k = Σ 2^(p mod w)
    over planes wk..wk+w with dot > 0), which is bit-identical to both
    the packed-signature slices (w=8) and the array-banded signature
    (w>8).  Verification is the sequential fold dot product — bit-exact
    across engines."""
    n_planes = n_bands * plane_bits
    dot_ab = _dot_sql("a.embedding", "b.embedding")
    norm = _dot_sql("embedding", "embedding")
    return f"""
WITH planes AS (
  SELECT p, d,
         (('0x' || substring(md5('plane:' || p || ':' || d), 1, 16))::UBIGINT
          % 2000003) / 1000001.5 - 1.0 AS w
  FROM (SELECT unnest(range({n_planes})) AS p)
  CROSS JOIN (SELECT unnest(range({DIM})) AS d)
),
vx AS (
  SELECT vec_id, i - 1 AS d, embedding[i]::DOUBLE AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS i)
),
dots AS (
  SELECT vec_id, p, sum(w * x) AS dot
  FROM vx JOIN planes USING (d) GROUP BY vec_id, p
),
bands AS (
  SELECT vec_id, p // {plane_bits} AS k,
         sum(CASE WHEN dot > 0 THEN (1 << (p % {plane_bits})) ELSE 0 END) AS band
  FROM dots GROUP BY vec_id, p // {plane_bits}
),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.band = b.band AND a.vec_id < b.vec_id
),
n AS (SELECT vec_id, embedding, {norm} AS norm2 FROM embeddings)
SELECT c.d1, c.d2, {dot_ab} / (sqrt(a.norm2) * sqrt(b.norm2)) AS sim
FROM cand c JOIN n a ON a.vec_id = c.d1 JOIN n b ON b.vec_id = c.d2
WHERE {dot_ab} / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.4
ORDER BY d1, d2
"""


def simsearch_lsh_wide_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARRAY-BANDED sign-LSH path (``lsh_band_values``) under a full
    value oracle: 12-bit bands × 8 bands = 96 hyperplanes — more than
    the packed 64-bit signature can hold, so this exercises exactly the
    geometry the corpus-size planner (``lsh_plane_bits``) switches to on
    large corpora.  Wider bands ⇒ fewer random candidates (n²/2¹² per
    band vs n²/2⁸); precision unchanged (exact cosine re-verification)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(emb, min_sim=0.4, plane_bits=12).orderBy(
        "d1", "d2"
    )


def ivf_multiprobe_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe IVF: each query scans the ``nprobe`` cells whose
    CENTROIDS are nearest to it — recovering the recall a single-probe
    IVF loses when a true neighbor sits just across a cell boundary.

    Centroids are computed distributed (one tiny row per cell via
    ``applyInPandas``) and collected — O(cells × dim) driver data, the
    IVF codebook every ANN system keeps resident.  The scan stays
    map-only over the candidate side with a per-batch BLAS matmul; the
    only change vs single-probe is the cell-membership mask (query q
    scores candidate c iff c's cell ∈ q's probe set).  At 100 TB with
    storage bucketed by cell, non-probed cells are partition-pruned.
    """
    import numpy as np
    import pandas as pd

    def cell_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {cell_col: [pdf[cell_col].iloc[0]], "centroid": [m.mean(axis=0).tolist()]}
        )

    cent_rows = (
        candidates.select(cell_col, vec_col)
        .groupBy(cell_col)
        .applyInPandas(cell_mean, f"{cell_col} long, centroid array<double>")
        .collect()
    )
    cells = np.array([r[0] for r in cent_rows], dtype="int64")
    cmat = np.stack([np.asarray(r[1]) for r in cent_rows])  # C × D

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    qm = np.stack([np.asarray(r[1], dtype="float64") for r in q_rows])
    # nearest nprobe cells per query by euclidean distance to centroid
    d2 = ((qm[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    probe_sets = [
        set(cells[np.argsort(d2[i])[:nprobe]].tolist()) for i in range(len(q_ids))
    ]
    qmat_t, q_norms = qm.T, np.sqrt((qm * qm).sum(axis=1))
    nq = len(q_ids)
    probes_b = [
        np.array([c in probe_sets[i] for c in cells], dtype=bool)
        for i in range(nq)
    ]
    cell_index = {c: j for j, c in enumerate(cells.tolist())}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ qmat_t) / np.outer(norms, q_norms)
            cand_cells = pdf[cell_col].to_numpy()
            cell_pos = np.array([cell_index[c] for c in cand_cells])
            # mask[c_row, q] = candidate's cell in query q's probe set
            mask = np.stack([probes_b[q][cell_pos] for q in range(nq)], axis=1)
            cand_ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, len(pdf)),
                    "neighbor_id": np.repeat(cand_ids, nq),
                    "probed": mask.ravel(),
                    "sim": np.round(sims.ravel(), 6),
                }
            )
            yield out[out.probed & (out.query_id != out.neighbor_id)][
                ["query_id", "neighbor_id", "sim"]
            ]

    scored = candidates.select(id_col, cell_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def ann_multiprobe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_multiprobe_topk(queries, emb, k=3, nprobe=2).orderBy("query_id", "rk")


#: DuckDB twin of the FULL multi-probe pipeline: per-cell centroid means,
#: nearest-2-centroid probe sets per query, probed-cell scan, rounded
#: cosine ranking.  The centroid step is a one-pass per-cell mean — SQL
#: avg() — so nothing here is iterative; probe ties break on (d2, label)
#: which matches the scan order of the driver codebook.
ANN_MULTIPROBE_SQL = f"""
WITH dims AS (SELECT unnest(range(1, {DIM + 1})) AS d),
cent AS (
  SELECT label, d, avg(embedding[d]::DOUBLE) AS c
  FROM embeddings CROSS JOIN dims GROUP BY label, d
),
qx AS (
  SELECT vec_id, d, embedding[d]::DOUBLE AS x
  FROM embeddings CROSS JOIN dims WHERE vec_id < 8
),
dist AS (
  SELECT qx.vec_id, cent.label, sum((x - c) * (x - c)) AS d2
  FROM qx JOIN cent USING (d) GROUP BY qx.vec_id, cent.label
),
probes AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
    FROM dist) t
  WHERE rn <= 2
),
n AS (SELECT vec_id, label, embedding, {_NORM} AS norm2 FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_AB} / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
  FROM n a JOIN probes p ON p.vec_id = a.vec_id
         JOIN n b ON b.label = p.label AND b.vec_id != a.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, sim, rk FROM ranked
WHERE rk <= 3 ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# int8 quantized similarity — the 100 TB storage/shuffle compression path
# --------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q[i] = round(x[i] / scale)`` ∈ [-127, 127].

    4× smaller than float32 (16× vs the float64 compute form) — at 100 TB
    the embedding column IS the data volume, so every downstream shuffle,
    broadcast, and cache shrinks 4×.  Quantized cosine needs NO
    dequantization: the per-vector scales cancel,
    ``cos_q = dotᵢₙₜ(q1,q2) / (√dotᵢₙₜ(q1,q1) · √dotᵢₙₜ(q2,q2))``,
    making the score an exact function of integers — bit-deterministic
    across engines with no rounding discipline needed.

    All-expression (codegen'd transform over the array): map-only,
    no shuffle, no Python.
    """
    v = F.col(vec_col).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (F.greatest(absmax, F.lit(1e-30)) / F.lit(127.0)).alias("q_scale")
    return df.select(
        F.col(id_col),
        "label",
        scale,
        F.transform(v, lambda x: F.round(x / F.col("q_scale")).cast("int")).alias(
            "q"
        ),
    )


def quantized_cell_pairs(
    qdf: DataFrame,
    min_sim: float = 0.35,
    cell_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Intra-cell quantized-cosine pairs: one int64 gram matrix per cell
    (``applyInPandas``), thresholded on the exact integer-derived score.
    Same blocked shape as ``dedup.embedding_dedup_pairs`` but over int8
    codes — the matmul moves 8× less data than the float64 form."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"d1": [], "d2": [], "qsim": []}).astype(
                {"d1": "int64", "d2": "int64", "qsim": "float64"}
            )
        pdf = pdf.sort_values(id_col)
        m = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        gram = m @ m.T  # exact: |q|≤127, 64 dims → well inside int64
        norms = np.sqrt(np.diag(gram).astype(np.float64))
        sims = gram / np.outer(norms, norms)
        iu = np.triu_indices(len(pdf), k=1)
        s = np.round(sims[iu], 6)
        keep = s >= min_sim
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {"d1": ids[iu[0]][keep], "d2": ids[iu[1]][keep], "qsim": s[keep]}
        )

    return qdf.groupBy(cell_col).applyInPandas(
        per_cell, "d1 long, d2 long, qsim double"
    )


def quantized_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_cell_pairs(quantize_embeddings(emb), min_sim=0.35).orderBy(
        "d1", "d2"
    )


def _quantized_sql() -> str:
    # identical integer pipeline: scale, round-to-int codes, integer gram
    dim = DIM
    scale = "greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) / 127.0"
    q = f"list_transform(embedding, x -> CAST(round(x::DOUBLE / ({scale})) AS BIGINT))"
    dot = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> a.q[i] * b.q[i]), (acc, x) -> acc + x)"
    )
    self_dot = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> q[i] * q[i]), (acc, x) -> acc + x)"
    )
    return f"""
WITH qv AS (SELECT vec_id, label, {q} AS q FROM embeddings),
n AS (SELECT vec_id, label, q, {self_dot} AS qq FROM qv)
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(({dot}) / (sqrt(a.qq) * sqrt(b.qq)), 6) AS qsim
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(({dot}) / (sqrt(a.qq) * sqrt(b.qq)), 6) >= 0.35
ORDER BY d1, d2
"""


def binary_hamming_topk(
    emb: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_pred=None,
) -> DataFrame:
    """1-bit quantized ANN: rank candidates by Hamming distance between
    64-bit sign signatures — the extreme end of the quantization ladder
    (float64 512 B → int8 64 B → 8 B code, 64× storage/shuffle
    compression; Hamming distance between sign codes is the standard
    monotone proxy for angular distance).

    Scale shape: the signature pass is map-only; the 8-byte codes — not
    the vectors — are what the ranking touches, and the (tiny) query
    code set broadcasts, so the candidate side is one map-only scan plus
    the per-query top-k window.  At 100 TB the codes fit where vectors
    cannot (1 PB of float32 embeddings → 16 TB of codes).
    """
    from ..caching import persist_tracked

    sigs = persist_tracked(
        emb.select(
            F.col(id_col).alias("vid"), lsh_signature(F.col(vec_col)).alias("code")
        )
    )
    q = sigs.filter(query_pred(F.col("vid")) if query_pred else F.col("vid") < 8)
    joined = sigs.crossJoin(
        F.broadcast(
            q.select(F.col("vid").alias("query_id"), F.col("code").alias("qcode"))
        )
    ).filter(F.col("vid") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.bit_count(F.col("code").bitwiseXOR(F.col("qcode"))).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "hamming", "rk")
    )


def ann_hamming_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return binary_hamming_topk(emb, k=3).orderBy("query_id", "rk")


def _hamming_sql() -> str:
    """DuckDB twin: per-plane sign bits re-derived from the md5-seeded
    hyperplanes; Hamming = count of differing signs (no 64-bit packing,
    so no signedness to reconcile)."""
    return f"""
WITH planes AS (
  SELECT p, d,
         (('0x' || substring(md5('plane:' || p || ':' || d), 1, 16))::UBIGINT
          % 2000003) / 1000001.5 - 1.0 AS w
  FROM (SELECT unnest(range({NUM_PLANES})) AS p)
  CROSS JOIN (SELECT unnest(range({DIM})) AS d)
),
vx AS (
  SELECT vec_id, i - 1 AS d, embedding[i]::DOUBLE AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS i)
),
bits AS (
  SELECT vec_id, p, sum(w * x) > 0 AS b
  FROM vx JOIN planes USING (d) GROUP BY vec_id, p
),
hams AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(CASE WHEN q.b != c.b THEN 1 ELSE 0 END) AS INT) AS hamming
  FROM bits q JOIN bits c ON q.p = c.p AND c.vec_id != q.vec_id
  WHERE q.vec_id < 8
  GROUP BY q.vec_id, c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY hamming, neighbor_id) AS rk
  FROM hams
)
SELECT query_id, neighbor_id, hamming, rk FROM ranked
WHERE rk <= 3 ORDER BY query_id, rk
"""




# --------------------------------------------------------------------------
# IVF-PQ: product quantization — the memory-scale path past int8
# --------------------------------------------------------------------------

#: PQ geometry: M subspaces of DIM/M dims, K codewords per subspace.
#: 64 float dims (256 B) → M uint8 codes (4 B): 64x compression, and the
#: ADC scan touches only code bytes + a per-query M x K lookup table.
PQ_M = 4
PQ_K = 16
PQ_SUB = DIM // PQ_M


def pq_train_codebook(candidates, vec_col="embedding", id_col="vec_id"):
    """Deterministic one-round-Lloyd PQ codebook: seeds = the first K
    vectors' subvectors (by id — no RNG), one distributed assignment pass,
    codeword = mean of assigned subvectors.  One round keeps the float
    arithmetic a single data-order-insensitive mean per (subspace, code) —
    the same portability trick as the multiprobe centroids, so the SQL
    oracle re-derives the identical codebook.  Returns
    {(j, code): np.ndarray(PQ_SUB)}; codes with no members are absent
    (excluded from encoding in both engines)."""
    import numpy as np

    seed_rows = (
        candidates.select(id_col, vec_col).orderBy(id_col).limit(PQ_K).collect()
    )
    seeds = np.stack([np.asarray(r[1], dtype="float64") for r in seed_rows])
    seeds_sub = seeds.reshape(PQ_K, PQ_M, PQ_SUB).transpose(1, 0, 2)  # M,K,S

    def assign_partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sub = m.reshape(len(m), PQ_M, PQ_SUB)
            out = {"j": [], "code": [], "cnt": [], "vsum": []}
            for j in range(PQ_M):
                d2 = ((sub[:, j, None, :] - seeds_sub[j][None, :, :]) ** 2).sum(2)
                a = d2.argmin(1)  # ties -> lowest code (np argmin = first)
                for code in np.unique(a):
                    rows = sub[a == code, j, :]
                    out["j"].append(j)
                    out["code"].append(int(code))
                    out["cnt"].append(len(rows))
                    out["vsum"].append(rows.sum(0).tolist())
            yield pd.DataFrame(out)

    parts = candidates.select(id_col, vec_col).mapInPandas(
        assign_partials, "j int, code int, cnt long, vsum array<double>"
    )
    agg = (
        parts.groupBy("j", "code")
        .agg(
            F.sum("cnt").alias("n"),
            F.array(*[
                F.sum(F.col("vsum")[i]).alias(f"s{i}") for i in range(PQ_SUB)
            ]).alias("vsum"),
        )
        .collect()
    )
    import numpy as _np

    return {
        (r["j"], r["code"]): _np.asarray(r["vsum"]) / r["n"] for r in agg
    }


def ivf_pq_topk(
    queries,
    candidates,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """PQ encode + asymmetric-distance (ADC) top-k.

    Scale shape: the codebook is O(M x K x SUB) driver data; candidates
    are encoded in one map-only pass and scanned with per-query lookup
    tables (no vector arithmetic in the scan — M byte-indexed adds per
    candidate).  At 100 TB the code table is 64x smaller than the float
    vectors and the scan is memory-bandwidth-, not FLOP-, bound; exact
    re-ranking of the ADC top-k against raw vectors is the standard
    second stage and composes with ``ann_cosine_topk``."""
    import numpy as np
    import pandas as pd

    cb = pq_train_codebook(candidates, vec_col, id_col)
    codes_by_j = [
        sorted(c for (j2, c) in cb if j2 == j) for j in range(PQ_M)
    ]
    cb_mats = [
        np.stack([cb[(j, c)] for c in codes_by_j[j]]) for j in range(PQ_M)
    ]

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    qm = np.stack([np.asarray(r[1], dtype="float64") for r in q_rows])
    q_sub = qm.reshape(len(qm), PQ_M, PQ_SUB)
    # ADC tables: adc[q][j][slot] = ||q_sub_j - codeword||^2
    adc = [
        [((q_sub[qi, j, None, :] - cb_mats[j]) ** 2).sum(1) for j in range(PQ_M)]
        for qi in range(len(q_ids))
    ]

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sub = m.reshape(len(m), PQ_M, PQ_SUB)
            slots = np.empty((len(m), PQ_M), dtype=np.int64)
            for j in range(PQ_M):
                d2 = ((sub[:, j, None, :] - cb_mats[j][None, :, :]) ** 2).sum(2)
                slots[:, j] = d2.argmin(1)
            cand_ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                dist = np.zeros(len(m))
                for j in range(PQ_M):
                    dist += adc[qi][j][slots[:, j]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids,
                            "approx_d2": np.round(dist, 6),
                        }
                    )
                )
            out = pd.concat(frames)
            yield out[out.query_id != out.neighbor_id]

    scored = candidates.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, approx_d2 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "approx_d2", "rk")
    )


def ann_ivf_pq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_pq_topk(queries, emb, k=3).orderBy("query_id", "rk")


def _ivf_pq_sql() -> str:
    """DuckDB twin of the FULL PQ pipeline: seed codewords (first K
    vectors, row_number order), one assignment round, mean codebook,
    encode, ADC tables, ranked scan.  avg() reproduces the one-round
    codeword means; argmin ties break on code slot in both engines."""
    return f"""
WITH dims AS (SELECT unnest(range(1, {DIM + 1})) AS d),
sub AS (SELECT d, (d - 1) // {PQ_SUB} AS j FROM dims),
vx AS (
  SELECT vec_id, j, d, embedding[d]::DOUBLE AS x
  FROM embeddings CROSS JOIN sub
),
seed_ids AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
),
seedx AS (
  SELECT s.code, v.j, v.d, v.x AS c FROM vx v JOIN seed_ids s USING (vec_id)
),
assign_d AS (
  SELECT v.vec_id, v.j, s.code, sum((v.x - s.c) * (v.x - s.c)) AS d2
  FROM vx v JOIN seedx s ON s.j = v.j AND s.d = v.d
  GROUP BY v.vec_id, v.j, s.code
),
assigned AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
    FROM assign_d) t WHERE rn = 1
),
cb AS (
  SELECT a.j, a.code, v.d, avg(v.x) AS c
  FROM assigned a JOIN vx v ON v.vec_id = a.vec_id AND v.j = a.j
  GROUP BY a.j, a.code, v.d
),
enc_d AS (
  SELECT v.vec_id, v.j, cb.code, sum((v.x - cb.c) * (v.x - cb.c)) AS d2
  FROM vx v JOIN cb ON cb.j = v.j AND cb.d = v.d
  GROUP BY v.vec_id, v.j, cb.code
),
enc AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
    FROM enc_d) t WHERE rn = 1
),
adc AS (
  SELECT q.vec_id AS query_id, q.j, cb.code,
         sum((q.x - cb.c) * (q.x - cb.c)) AS d2
  FROM vx q JOIN cb ON cb.j = q.j AND cb.d = q.d
  WHERE q.vec_id < 8
  GROUP BY q.vec_id, q.j, cb.code
),
scored AS (
  SELECT a.query_id, e.vec_id AS neighbor_id,
         round(sum(a.d2), 6) AS approx_d2
  FROM enc e JOIN adc a ON a.j = e.j AND a.code = e.code
  WHERE e.vec_id != a.query_id
  GROUP BY a.query_id, e.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, approx_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY approx_d2, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, approx_d2, rk FROM ranked
WHERE rk <= 3 ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# Embedding sanity screening: distance-to-centroid outliers
# --------------------------------------------------------------------------


def centroid_distances(
    df: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector euclidean distance to its OWN cell's centroid — the
    embedding-quality screen of a training pipeline (mislabeled / corrupt
    / off-manifold vectors sit far from their cluster's mass).

    Pure-Catalyst formulation: posexplode the components, aggregate the
    per-(cell, dim) means, broadcast the O(cells × dim) centroid table
    back, one keyed aggregation for Σ(x−c)².  Distances round to 6
    decimals — the same cross-engine float discipline the multiprobe/PQ
    oracles use (summation-order ulps sit ~9 orders below the rounding
    grain).  No per-row Python anywhere.
    """
    dims = df.select(
        F.col(id_col),
        F.col(cell_col),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = dims.groupBy(cell_col, "d").agg(F.avg("x").alias("c"))
    return (
        dims.join(F.broadcast(cent), [cell_col, "d"])
        .groupBy(id_col, cell_col)
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))),
                6,
            ).alias("dist_r")
        )
    )


#: absolute screening threshold for the registry query (both engines
#: compare the SAME rounded distance against it, so the flag is exact)
OUTLIER_DIST_T = 1.02


def emb_outlier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = centroid_distances(emb)
    return out.select(
        "vec_id",
        "label",
        "dist_r",
        (F.col("dist_r") > F.lit(OUTLIER_DIST_T)).alias("is_outlier"),
    ).orderBy("vec_id")


EMB_OUTLIER_SQL = f"""
WITH dims AS (SELECT unnest(range(1, {DIM + 1})) AS d),
x AS (
  SELECT vec_id, label, d, embedding[d]::DOUBLE AS x
  FROM embeddings CROSS JOIN dims
),
cent AS (
  SELECT label, d, avg(x) AS c FROM x GROUP BY label, d
),
dist AS (
  SELECT vec_id, x.label,
         round(sqrt(sum((x - c) * (x - c))), 6) AS dist_r
  FROM x JOIN cent ON x.label = cent.label AND x.d = cent.d
  GROUP BY vec_id, x.label
)
SELECT vec_id, label, dist_r, dist_r > {OUTLIER_DIST_T} AS is_outlier
FROM dist ORDER BY vec_id
"""




# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (deterministic sign matrix)
# --------------------------------------------------------------------------

RP_OUT = 16  #: projected dimensionality


def _rp_signs() -> list[list[int]]:
    """Deterministic JL sign matrix: ±1 from the first md5 byte of
    ``rp:{i}:{j}`` — reproducible anywhere (Achlioptas 2003 database-
    friendly projections use exactly iid ±1 entries), so the SAME literal
    matrix is embedded in the oracle SQL and the operator is value-exact
    across engines."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(DIM)
        ]
        for j in range(RP_OUT)
    ]


def random_projection_fold(df: DataFrame) -> DataFrame:
    """Reference formulation: each output dim as the sequential
    ``zip_with`` + ``aggregate`` fold (the pattern every oracle mirrors
    with ``list_reduce``).  Value-identical to the Arrow path below —
    pinned by ``test_random_projection_paths_agree`` — but the
    interpreted per-element lambdas cost ~16·dim evals per row, so the
    query path uses the vectorized twin."""
    signs = _rp_signs()
    cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(float(s)) for s in signs[j]]),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(0.25),
            6,
        ).alias(f"p{j:02d}")
        for j in range(RP_OUT)
    ]
    return df.select("vec_id", *cols).orderBy("vec_id")


def random_projection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 → 16 dims: the cheap-ANN preprocessing
    step (project once, bucket/search in the small space; pairwise
    distances are preserved within 1±ε).  Signs are a fixed ±1 matrix
    (``_rp_signs``), scale 1/√16 = 0.25 (exact binary, no rounding
    drift).

    Execution: one Arrow ``mapInPandas`` pass; the per-dim sum runs as
    ``np.add.accumulate`` — NumPy's ufunc accumulate is STRICTLY
    sequential (result[i] = result[i-1] + x[i]), so the double
    arithmetic reproduces the oracle's ``list_reduce`` fold bit for bit
    (unlike ``np.dot``/``np.sum``, whose pairwise/BLAS orders drift in
    the last ulps).  The final 6-decimal rounding happens in Catalyst so
    the rounding mode is the engine's own, not NumPy's half-even.
    Measured 2.2× faster than the interpreted-lambda fold
    (``random_projection_fold``, kept as the value-twin and pinned equal
    in tests).

    Scale: map-only — no shuffle, no driver state beyond the 1 KB sign
    matrix shipped with the closure; at 100 TB this is a pure
    scan-transform pass, and the 4× narrower output is what downstream
    ANN shuffles."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    signs = np.array(_rp_signs(), dtype=np.float64)
    raw_schema = "vec_id long, " + ", ".join(
        f"p{j:02d} double" for j in range(RP_OUT)
    )

    def batches(it):
        for pdf in it:
            x = np.stack(pdf["embedding"].values).astype(np.float64)
            out = {"vec_id": pdf["vec_id"].values}
            for j in range(RP_OUT):
                seq_sum = np.add.accumulate(x * signs[j], axis=1)[:, -1]
                out[f"p{j:02d}"] = seq_sum * 0.25
            yield pd.DataFrame(out)

    projected = emb.select("vec_id", "embedding").mapInPandas(
        batches, schema=raw_schema
    )
    return projected.select(
        "vec_id",
        *[F.round(F.col(f"p{j:02d}"), 6).alias(f"p{j:02d}")
          for j in range(RP_OUT)],
    ).orderBy("vec_id")


def _rp_sql() -> str:
    signs = _rp_signs()
    cols = []
    for j, row in enumerate(signs):
        arr = "[" + ", ".join(f"{s}.0" for s in row) + "]"
        fold = (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> embedding[i]::DOUBLE * ({arr}::DOUBLE[])[i]), "
            "(acc, x) -> acc + x)"
        )
        cols.append(f"round({fold} * 0.25, 6) AS p{j:02d}")
    return (
        "SELECT vec_id, " + ", ".join(cols)
        + " FROM embeddings ORDER BY vec_id"
    )


SIMILARITY_QUERIES = {
    "ann_cosine_topk": (ann_topk_query, ANN_TOPK_SQL),
    "ann_ivf_label": (ann_ivf_query, ANN_IVF_SQL),
    # every LSH/probe family below is deterministic (md5-seeded planes /
    # one-pass centroids) and carries a FULL value oracle
    "simsearch_lsh_cosine": (simsearch_lsh_query, _lsh_cosine_sql()),
    "simsearch_lsh_wide": (
        simsearch_lsh_wide_query,
        _lsh_cosine_sql(plane_bits=12),
    ),
    "ann_ivf_multiprobe": (ann_multiprobe_query, ANN_MULTIPROBE_SQL),
    "simsearch_int8_pairs": (quantized_pairs_query, _quantized_sql()),
    "ann_hamming_topk": (ann_hamming_query, _hamming_sql()),
    "ann_ivf_pq": (ann_ivf_pq_query, _ivf_pq_sql()),
    "emb_outlier_dist": (emb_outlier_query, EMB_OUTLIER_SQL),
    "emb_random_projection": (random_projection_query, _rp_sql()),
}


def ann_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe against exact brute-force cosine —
    the accuracy ledger for the ANN speed/quality trade (the similarity
    twin of ``dedup_minhash_accuracy``): per query, how many of the true
    top-10 neighbors the single-cell probe recovers.

    At scale this is the measurement one runs on a sampled query set
    before choosing nprobe/cell counts; both sides reuse the engine's
    scoring operators (one broadcast-queries BLAS scan each), and the
    comparison joins two k-row-per-query tables — negligible beyond the
    scans themselves."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(queries, emb, k=10).select(
        "query_id", "neighbor_id"
    )
    probe = ivf_topk(queries, emb, k=10).select(
        F.col("query_id").alias("p_query_id"),
        F.col("neighbor_id").alias("p_neighbor_id"),
    )
    hits = exact.join(
        probe,
        (F.col("query_id") == F.col("p_query_id"))
        & (F.col("neighbor_id") == F.col("p_neighbor_id")),
        "left_semi",
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .join(
            hits.groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


ANN_RECALL_SQL = f"""
WITH n AS (SELECT vec_id, label, embedding, {_NORM} AS norm2 FROM embeddings),
exact_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_AB} / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
  FROM n a JOIN n b ON a.vec_id < 8 AND b.vec_id != a.vec_id
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rk
    FROM exact_scored) WHERE rk <= 10
),
probe_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_AB} / (sqrt(a.norm2) * sqrt(b.norm2)), 6) AS sim
  FROM n a JOIN n b
    ON a.vec_id < 8 AND b.label = a.label AND b.vec_id != a.vec_id
),
probe_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rk
    FROM probe_scored) WHERE rk <= 10
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall
FROM exact_top e
LEFT JOIN probe_top p
  ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


SIMILARITY_QUERIES["ann_ivf_recall"] = (ann_recall_query, ANN_RECALL_SQL)
