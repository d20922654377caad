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


#: fixed-point scale for the PageRank iteration — 1e12 keeps six
#: meaningful decimal digits after five damping multiplications while
#: every intermediate stays far inside int64.
PR_SCALE = 1_000_000_000_000
PR_ROUNDS = 5


def pagerank(
    edges: DataFrame,
    rounds: int = PR_ROUNDS,
    src_col: str = "d1",
    dst_col: str = "d2",
) -> DataFrame:
    """PageRank over the (symmetrized) near-dup graph in FIXED-POINT
    integer arithmetic — fully deterministic, hence value-oracle-checkable,
    unlike a floating-point power iteration whose partial-sum order
    differs between engines.

    Semantics: restricted to edge-touching nodes (isolated docs carry no
    centrality signal and would make N corpus-sized for no information);
    after symmetrization every node has deg ≥ 1, so there is no dangling
    mass.  Per round, each node divides its integer rank evenly among
    neighbors (floor division — the dropped remainder is the documented
    fixed-point truncation, identical in both engines), and
    ``p' = (0.15·SCALE)//N + (85·Σ incoming)//100``.

    Scale shape: one keyed join + one map-side-combined sum per round
    over the EDGE table (sparse, ≪ corpus); rank table localCheckpointed
    per round so lineage stays O(1) — the same iterate/checkpoint loop as
    :func:`connected_components`."""
    e = edges.select(
        F.col(src_col).cast("long").alias("a"),
        F.col(dst_col).cast("long").alias("b"),
    ).localCheckpoint(eager=True)
    adj = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    n_edges = adj.count()
    parts = max(1, min(adj.rdd.getNumPartitions(), n_edges // 1_000_000 + 1))
    adj = adj.repartition(parts, "a").localCheckpoint(eager=True)

    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n_nodes = deg.count()  # driver scalar (same class as the CC round counts)
    base = (15 * PR_SCALE // 100) // max(n_nodes, 1)
    ptab = deg.select(
        "node", "deg", F.lit(PR_SCALE // max(n_nodes, 1)).alias("p")
    ).repartition(parts, "node").localCheckpoint(eager=True)
    for _ in range(rounds):
        inc = (
            adj.join(ptab, adj.a == ptab.node)
            .select("b", F.expr("p div deg").alias("contrib"))
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("contrib").alias("inc"))
        )
        ptab = (
            ptab.select("node", "deg")
            .join(inc, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(inc, 0L) div 100")
                ).cast("long").alias("p"),
            )
            .repartition(parts, "node")
            .localCheckpoint(eager=True)
        )
    return ptab.select(
        F.col("node").alias("doc_id"),
        F.col("deg").cast("long").alias("deg"),
        F.col("p").alias("pagerank_fp"),
        (F.col("p").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )


def pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality over the exact n-gram Jaccard near-dup graph: which
    documents sit at the heart of a duplication family (template pages,
    boilerplate hubs) versus its periphery — the ranking signal used to
    pick KEEP candidates beyond plain quality scores.  Reuses the
    process-cached pair set shared with the rest of the dedup family."""
    from .dedup import cached_ngram_pairs

    pairs = cached_ngram_pairs(spark, sf_dir, n=3, threshold_num=1, threshold_den=5)
    return pagerank(pairs.select("d1", "d2")).orderBy("doc_id")


def _pagerank_sql(rounds: int = PR_ROUNDS) -> str:
    from .dedup import NGRAM_KEPT_CTE

    base = f"(150000000000 // (SELECT n FROM nn))"
    parts = [
        f"""
WITH {NGRAM_KEPT_CTE},
prpairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
adj AS (SELECT d1 AS a, d2 AS b FROM prpairs
        UNION SELECT d2, d1 FROM prpairs),
deg AS (SELECT a AS node, count(*) AS deg FROM adj GROUP BY a),
nn AS (SELECT count(*) AS n FROM deg),
p0 AS (SELECT node, deg,
              CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS p
       FROM deg)"""
    ]
    for k in range(1, rounds + 1):
        prev = f"p{k - 1}"
        parts.append(
            f""",
p{k} AS (
  SELECT d.node, d.deg,
         CAST({base} + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS p
  FROM deg d LEFT JOIN (
    SELECT adj.b AS node, CAST(sum({prev}.p // {prev}.deg) AS BIGINT) AS inc
    FROM adj JOIN {prev} ON adj.a = {prev}.node GROUP BY adj.b
  ) s ON d.node = s.node)"""
        )
    parts.append(
        f"""
SELECT node AS doc_id, CAST(deg AS BIGINT) AS deg, p AS pagerank_fp,
       CAST(p AS DOUBLE) / {float(PR_SCALE)} AS pagerank
FROM p{rounds} ORDER BY doc_id
"""
    )
    return "".join(parts)


def triangle_count(
    edges: DataFrame, src_col: str = "d1", dst_col: str = "d2"
) -> DataFrame:
    """Global triangle census of the (undirected) near-dup graph: node /
    edge / wedge / triangle counts and the global clustering coefficient
    ``3·T / W`` — the standard boilerplate-web-structure signal (a
    duplication family of templated pages is triangle-dense; chains of
    incremental edits are not).

    Scale formulation — DEGREE-ORDERED edge orientation (the
    node-iterator++ / forward algorithm; Schank & Wagner's compact-forward,
    also the shape of Suri & Vassilvitskii's MR-CF): every edge is
    directed from its lower-(degree, id) endpoint to the higher, so each
    wedge is generated at its LOWEST-degree apex exactly once and the
    wedge join fans out O(Σ out_deg²) = O(m^{3/2}) worst-case instead of
    Σ deg² — a hot hub (a million-page boilerplate family) contributes
    out-edges only toward higher-degree nodes, never a deg² explosion.
    Three keyed self-joins, no driver state.

    The RESULT is orientation-invariant (wedge count uses undirected
    degrees: Σ deg·(deg−1)/2), so the oracle may use the naive
    a<b<c three-way join formulation; only the plan shape differs.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # orient by the total order (deg, node): rank struct comparisons are
    # native Catalyst expressions, so the joins below stay hash joins
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (
        e.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            F.col("a"), F.col("b"),
            F.struct(
                F.col("da.deg").alias("deg"), F.col("a").alias("node")
            ).alias("ra"),
            F.struct(
                F.col("db.deg").alias("deg"), F.col("b").alias("node")
            ).alias("rb"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("ra") < F.col("rb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("ra") < F.col("rb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(F.col("ra") < F.col("rb"), F.col("rb")).otherwise(F.col("ra")).alias("rdst"),
    ).localCheckpoint(eager=True)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    # wedges at the minimum-rank apex; the closing edge is oriented
    # lower-rank endpoint → higher by construction of the total order
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.rdst") < F.col("e2.rdst")),
    ).select(
        F.col("e1.dst").alias("u"), F.col("e2.dst").alias("v")
    )
    n_tri = wedges.join(
        e3,
        (F.col("u") == F.col("e3.src")) & (F.col("v") == F.col("e3.dst")),
        "left_semi",
    ).count()
    stats = (
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            # coalesce: SUM over an empty degree table (edgeless input)
            # must report 0 wedges, not NULL
            F.coalesce(
                F.sum(F.expr("deg * (deg - 1) div 2")), F.lit(0)
            ).cast("long").alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    )
    spark = edges.sparkSession
    return stats.crossJoin(
        spark.createDataFrame([(n_tri,)], "n_triangles long")
    ).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (
            F.lit(3.0) * F.col("n_triangles").cast("double")
            / F.when(F.col("n_wedges") > 0, F.col("n_wedges").cast("double"))
        ).alias("clustering_coeff"),
    )


def triangle_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the exact n-gram Jaccard near-dup graph —
    reuses the process-cached pair set shared with the dedup family."""
    from .dedup import cached_ngram_pairs

    pairs = cached_ngram_pairs(spark, sf_dir, n=3, threshold_num=1, threshold_den=5)
    return triangle_count(pairs.select("d1", "d2"))


def _triangle_sql() -> str:
    from .dedup import NGRAM_KEPT_CTE

    return f"""
WITH {NGRAM_KEPT_CTE},
tpairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
te AS (SELECT LEAST(d1, d2) AS a, GREATEST(d1, d2) AS b
       FROM tpairs WHERE d1 <> d2 GROUP BY 1, 2),
tdeg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM te UNION ALL SELECT b FROM te
  ) GROUP BY node
),
tcnt AS (
  SELECT COUNT(*) AS t FROM te e1
  JOIN te e2 ON e2.a = e1.b
  JOIN te e3 ON e3.a = e1.a AND e3.b = e2.b
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM tdeg
)
SELECT n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM te) AS n_edges,
       n_wedges,
       (SELECT CAST(t AS BIGINT) FROM tcnt) AS n_triangles,
       CASE WHEN n_wedges > 0
            THEN 3.0 * (SELECT t FROM tcnt) / CAST(n_wedges AS DOUBLE)
            END AS clustering_coeff
FROM agg
"""


GRAPH_QUERIES = {
    "dedup_clusters": (dedup_clusters_query, _clusters_sql()),
    "pipeline_dedup_corpus": (dedup_corpus_audit_query, _dedup_corpus_audit_sql()),
    "dedup_keep_best": (dedup_keep_best_query, _keep_best_sql()),
    "dedup_pagerank_centrality": (pagerank_query, _pagerank_sql()),
    "graph_triangle_count": (triangle_count_query, _triangle_sql()),
}
