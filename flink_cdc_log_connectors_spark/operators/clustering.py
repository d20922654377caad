"""Distributed k-means (Lloyd) over an embedding column.

Provides the IVF cell assignment the similarity operators take as input
(`label` in the synthetic tables stands in for exactly this at test
scale): cluster the vectors once, store/bucket by cell, and ANN probes
become partition-pruned cell scans.

Spark-first iteration shape (the standard Lloyd-on-Spark contract):

- **Centroids live on the driver** (k × dim doubles — the codebook; tiny)
  and ship to executors inside the task closure each round.
- **Assignment + partial aggregation in ONE pass**: each Arrow batch
  computes argmin distances with a BLAS matmul and emits ≤ k rows of
  (cluster, count, sum_vector) — map-side combine, so the driver merge
  handles k × batches rows regardless of input size.
- **No shuffle at all inside a round** — the only data movement is the
  collect of per-batch partials; a 100 TB input iterates with the same
  driver memory as a 1 GB one.

Determinism: init = first k vectors by id (no RNG); argmin ties break to
the lowest cluster index.  Float partial sums combine in collected order,
so centroid low-order bits can vary run-to-run — assignments on
well-separated data are stable (tests use separable clusters; the
registry records a rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    tol: float = 1e-6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's algorithm; returns (id, cluster, dist2) assignments."""
    import numpy as np
    import pandas as pd

    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centroids = np.stack([np.asarray(r[1], dtype="float64") for r in init_rows])

    vecs = df.select(id_col, vec_col)
    # Iterative algorithm: every Lloyd round re-reads the input, so pin it
    # once (MEMORY_AND_DISK — spills, never OOMs) instead of re-scanning
    # parquet max_iter+1 times.  No forced repartition: per-round cost on
    # small inputs is task overhead, not BLAS (2k vectors compute in µs),
    # and at real scale the file count already provides parallelism.
    # persist_tracked, not a bare persist: repeated invocations (bench
    # loops, registry sweeps) would otherwise leak one cached input per
    # call for the session's lifetime.
    from ..caching import persist_tracked

    vecs = persist_tracked(vecs)

    def partials_for(cm: np.ndarray):
        cm_sq = (cm * cm).sum(axis=1)

        def op(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
                # argmin over squared distance; ||x||² constant per row →
                # minimize -2 x·c + ||c||²
                scores = -2.0 * (m @ cm.T) + cm_sq[None, :]
                assign = scores.argmin(axis=1)
                counts = np.bincount(assign, minlength=len(cm))
                sums = np.zeros_like(cm)
                np.add.at(sums, assign, m)
                nz = np.nonzero(counts)[0]
                yield pd.DataFrame(
                    {
                        "cluster": nz.astype("int32"),
                        "cnt": counts[nz].astype("int64"),
                        "vsum": [sums[c].tolist() for c in nz],
                    }
                )

        return op

    for _ in range(max_iter):
        rows = vecs.mapInPandas(
            partials_for(centroids),
            "cluster int, cnt long, vsum array<double>",
        ).collect()
        counts = np.zeros(k)
        sums = np.zeros_like(centroids)
        for r in sorted(rows, key=lambda r: r["cluster"]):
            counts[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["vsum"])
        nonempty = counts > 0
        new_centroids = centroids.copy()
        new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break

    cm, cm_sq = centroids, (centroids * centroids).sum(axis=1)

    def assign_op(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            scores = -2.0 * (m @ cm.T) + cm_sq[None, :]
            a = scores.argmin(axis=1)
            d2 = (m * m).sum(axis=1) + scores[np.arange(len(m)), a]
            yield pd.DataFrame(
                {
                    "id": pdf.iloc[:, 0],
                    "cluster": a.astype("int32"),
                    "dist2": np.round(np.maximum(d2, 0.0), 6),
                }
            )

    return (
        vecs.mapInPandas(assign_op, f"id long, cluster int, dist2 double")
        .withColumnRenamed("id", id_col)
    )


def kmeans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # IVF-cell tolerance: this corpus's centroid shift plateaus ~7e-3
    # (non-separable tail), so tol=1e-6 burns all max_iter round-trips
    # for nothing.  Stopping at a 1e-2 shift halves the driver-sync
    # rounds; the ~8% of vectors that flip are cell-BOUNDARY points
    # (measured at sf0.1) whose membership Lloyd keeps oscillating —
    # exactly the vectors IVF multiprobe exists to cover regardless of
    # which side they land on.
    return kmeans_assign(emb, k=10, max_iter=10, tol=1e-2).orderBy("vec_id")


CLUSTERING_QUERIES = {
    # float centroid sums are not ANSI-portable — rows-only; cluster
    # recovery is asserted on separable data in tests.
    "emb_kmeans_assign": (kmeans_query, None),
}
