"""Connected components over near-duplicate pair edges.

Pair generators (n-gram Jaccard, MinHash, SimHash, embedding cosine) emit
EDGES; a dedup pipeline needs the transitive closure — every doc labeled
with its cluster representative (the minimum doc id reachable through any
chain of near-dup pairs) so exactly one doc per cluster survives.

Spark-first design: iterative min-label propagation with pointer jumping.
Each round is one join (labels → neighbors) + one label-chase self-join +
one map-side-combined min aggregation; labels monotonically decrease and
the chase doubles covered distance per round, so the iteration count is
O(log diameter) — a depth-10^6 chain converges in ~20 rounds.  Every round ``localCheckpoint``s the
label table: lineage stays O(1) deep instead of O(rounds), which is what
keeps the job plannable at 100 TB (a 20-round lineage of joins would
otherwise blow up the optimizer and re-execute everything on any task
retry).  Convergence is detected with a count of changed labels —
a driver-side scalar per round, not a collect of data.

The whole computation is deterministic (min is order-insensitive), so the
DuckDB oracle — a recursive CTE computing min reachable id — hash-matches
exactly.  This is the engine's declared "iterative algorithm" surface;
the same loop shape (iterate → checkpoint → converge-test) serves
label propagation, PageRank-style scoring, and k-means at deployment.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

logger = logging.getLogger(__name__)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "d1",
    dst_col: str = "d2",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id in its connected component.

    ``nodes``: one row per node (isolated nodes keep their own id).
    ``edges``: undirected pairs (each stored once in either orientation).
    Returns (id_col, cluster_id).
    """
    # Materialize the incoming edge set FIRST: it feeds both union branches
    # below, and edge generation is typically an expensive pair pipeline
    # (LSH/inverted-index) that must not execute once per branch.
    e = edges.select(
        F.col(src_col).cast("long").alias("a"), F.col(dst_col).cast("long").alias("b")
    ).localCheckpoint(eager=True)
    adj = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()

    # Size the iteration's partitioning to the EDGE data, not the session
    # default: near-dup graphs are sparse (edges ≪ corpus), and running
    # each tiny round over 32+ shuffle partitions pays 32 task launches
    # per stage for rows that fit in one.  ~1M edge-rows per partition;
    # grows with the graph, so the same rule holds at 100 TB.
    n_edges = adj.count()
    parts = max(1, min(adj.rdd.getNumPartitions(), n_edges // 1_000_000 + 1))
    adj = adj.repartition(parts, "a").localCheckpoint(eager=True)

    # Iterate ONLY over nodes that touch an edge: isolated nodes (the
    # overwhelming majority of a deduped corpus) can never change label,
    # so they stay out of every round and rejoin at the end — per-round
    # work is O(|edge nodes|), not O(|corpus|).  Initial label =
    # min(self, direct neighbors) — the first propagation round folded
    # into one aggregation, no join.
    labels = (
        adj.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
        .repartition(parts, "node")
        .localCheckpoint(eager=True)
    )

    # Convergence via the label-sum: labels only ever decrease, so an
    # unchanged sum ⇔ a fixpoint — one aggregate scan per round instead
    # of a join-and-count.  DECIMAL(38,0) so the sum cannot overflow even
    # at 10^12 nodes × 10^12 max id.
    #
    # Each round unions TWO message sets before the min-aggregation:
    #   1. neighbor propagation (adjacency join) — advances one hop;
    #   2. pointer jumping (label → that node's label) — doubles the
    #      already-covered distance, so a depth-d chain converges in
    #      O(log d) rounds instead of O(d).  Label values are always
    #      edge-touching node ids (min over self+neighbors), so the
    #      label⋈node self-join always hits; `labels` is checkpointed
    #      from the previous round, so both branches read materialized
    #      rows, not lineage.
    prev_sum = None
    converged = False
    rounds = 0
    for rounds in range(1, max_iterations + 1):
        msgs = (
            adj.join(labels, adj.a == labels.node)
            .select(F.col("b").alias("node"), "label")
        )
        chase = labels.select(
            F.col("node").alias("ln"), F.col("label").alias("ll")
        )
        jump = (
            labels.join(chase, F.col("label") == F.col("ln"))
            .select("node", F.col("ll").alias("label"))
        )
        labels = (
            labels.select("node", "label")
            .union(msgs)
            .union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Silent partial closure would split clusters into multiple
        # "representatives" with no signal — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds; with pointer jumping this needs a component of "
            f"min-path depth > 2^{max_iterations} — raise max_iterations"
        )
    logger.info("connected_components converged in %d rounds", rounds)

    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    return (
        base.join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("label"), F.col("node")).alias("cluster_id"),
        )
    )


def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment from the EXACT n-gram Jaccard pair set: every doc
    → min doc id transitively reachable through jaccard ≥ 0.2 pairs.
    Reuses the process-cached pair set shared with dedup_ngram_jaccard —
    one inverted-index join feeds the whole dedup family."""
    from .dedup import cached_ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = cached_ngram_pairs(spark, sf_dir, n=3, threshold_num=1, threshold_den=5)
    return connected_components(
        docs.select("doc_id"), pairs.select("d1", "d2")
    ).orderBy("doc_id")


def _clusters_sql() -> str:
    from .dedup import NGRAM_KEPT_CTE

    return f"""
WITH RECURSIVE {NGRAM_KEPT_CTE},
pairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
adj AS (SELECT d1 AS a, d2 AS b FROM pairs
        UNION SELECT d2, d1 FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT adj.b, reach.label FROM reach JOIN adj ON adj.a = reach.node
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


def keep_best_per_cluster(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup POLICY step: from each near-dup cluster keep the
    highest-quality document (ties → lowest id).  One window over the
    cluster key — a single hash shuffle on ``cluster_id``; cluster count
    ≪ corpus, and the window carries only (cluster, id, quality) skinny
    rows, so the policy pass costs far less than the pair generation
    that feeds it."""
    from pyspark.sql.window import Window

    joined = clusters.join(docs.select(id_col, quality_col), id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("__rn") == 1)
        .select(
            F.col("cluster_id"),
            F.col(id_col).alias("keep_doc_id"),
            F.col(quality_col).alias("best_quality"),
            F.col("cluster_size").cast("int").alias("cluster_size"),
        )
    )


def dedup_keep_best_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection over the n-gram Jaccard clusters:
    keep the longest doc per cluster.  Reuses the process-cached pair set
    (one inverted-index join feeds clusters AND policy)."""
    from .dedup import cached_ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = cached_ngram_pairs(spark, sf_dir, n=3, threshold_num=1, threshold_den=5)
    clusters = connected_components(docs.select("doc_id"), pairs.select("d1", "d2"))
    return keep_best_per_cluster(clusters, docs).orderBy("cluster_id")


def _keep_best_sql() -> str:
    from .dedup import NGRAM_KEPT_CTE

    return f"""
WITH RECURSIVE {NGRAM_KEPT_CTE},
pairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
adj AS (SELECT d1 AS a, d2 AS b FROM pairs
        UNION SELECT d2, d1 FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT adj.b, reach.label FROM reach JOIN adj ON adj.a = reach.node
),
clusters AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT cluster_id, doc_id AS keep_doc_id, n_chars AS best_quality,
       CAST(cluster_size AS INT) AS cluster_size
FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


def dedup_corpus_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED dedup pipeline as one per-document audit table — the
    end-to-end "clean this corpus" user story: inverted-index pair
    generation → connected components → canonical-doc policy, then every
    document labeled ``kept`` / ``exact_dup`` / ``near_dup`` with the id
    that superseded it.  Exact duplicates are near-dup cluster members
    whose md5 equals their keeper's (Jaccard 1 pairs are already in the
    pair set, so no separate exact pass is needed — the md5 join only
    CLASSIFIES the drop reason).

    All three stages reuse the process-cached pair set; the audit adds
    one cluster join + one broadcast-sized keeper join on top.
    """
    from .dedup import cached_ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = cached_ngram_pairs(spark, sf_dir, n=3, threshold_num=1, threshold_den=5)
    clusters = connected_components(docs.select("doc_id"), pairs.select("d1", "d2"))
    best = keep_best_per_cluster(clusters, docs)
    fp = docs.select("doc_id", F.md5("text").alias("__fp"))
    keeper_fp = fp.select(
        F.col("doc_id").alias("keep_doc_id"), F.col("__fp").alias("__keep_fp")
    )
    out = (
        clusters.join(best, "cluster_id")
        .join(fp, "doc_id")
        .join(keeper_fp, "keep_doc_id")
        .select(
            "doc_id",
            F.when(F.col("doc_id") == F.col("keep_doc_id"), "kept")
            .when(F.col("__fp") == F.col("__keep_fp"), "exact_dup")
            .otherwise("near_dup")
            .alias("status"),
            F.col("keep_doc_id").alias("kept_by"),
            F.col("cluster_size"),
        )
    )
    return out.orderBy("doc_id")


def _dedup_corpus_audit_sql() -> str:
    from .dedup import NGRAM_KEPT_CTE

    return f"""
WITH RECURSIVE {NGRAM_KEPT_CTE},
pairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
adj AS (SELECT d1 AS a, d2 AS b FROM pairs
        UNION SELECT d2, d1 FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT adj.b, reach.label FROM reach JOIN adj ON adj.a = reach.node
),
clusters AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
),
keepers AS (
  SELECT cluster_id, doc_id AS keep_doc_id, cluster_size
  FROM ranked WHERE rn = 1
)
SELECT c.doc_id,
       CASE WHEN c.doc_id = k.keep_doc_id THEN 'kept'
            WHEN md5(d.text) = md5(kd.text) THEN 'exact_dup'
            ELSE 'near_dup' END AS status,
       k.keep_doc_id AS kept_by,
       CAST(k.cluster_size AS INT) AS cluster_size
FROM clusters c
JOIN keepers k ON c.cluster_id = k.cluster_id
JOIN documents d ON c.doc_id = d.doc_id
JOIN documents kd ON k.keep_doc_id = kd.doc_id
ORDER BY c.doc_id
"""


GRAPH_QUERIES = {
    "dedup_clusters": (dedup_clusters_query, _clusters_sql()),
    "pipeline_dedup_corpus": (dedup_corpus_audit_query, _dedup_corpus_audit_sql()),
    "dedup_keep_best": (dedup_keep_best_query, _keep_best_sql()),
}
