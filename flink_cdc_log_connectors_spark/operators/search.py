"""Full-text ranked retrieval (BM25) over the document corpus.

The missing member next to the embedding-space searches in
``similarity.py``: lexical top-k retrieval, the operator behind corpus
search / hard-negative mining in training-data pipelines.

Determinism note: classic BM25 weights terms by ``ln((N-df+0.5)/(df+0.5))``.
``ln`` carries no cross-engine correctly-rounded guarantee (Java Math.log
vs C libm), so the oracle-checked score uses the RATIONAL idf surrogate
``(N-df+0.5)/(df+0.5)`` — strictly monotone in the classic idf, so
rankings keep BM25's structure while every arithmetic step (integer
subtract, one multiply, one divide per factor) is exactly-rounded IEEE
and bit-identical across Spark and DuckDB.  Per-query scores sum in a
FIXED expression order (term-slot columns, not a float fold), rounded to
6 decimals, ranked on the rounded value with doc_id tie-break.

Scale shape: term frequencies are one shuffle keyed by (doc, term); the
document-frequency table per QUERY term is tiny (≤ terms×1 rows) and
broadcast; the corpus-side scan joins it map-only, so the only corpus
-wide shuffles are the tf groupBy and the final per-query top-k
(TakeOrdered — no global sort).  N and total token count are two scalar
aggregates (driver-side scalars, same stance as the IVF codebooks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import TOKENS_SQL
from ..io import load_table

BM25_K1 = 1.2
BM25_B = 0.75

#: fixed benchmark query set (terms drawn from the corpus vocabulary);
#: each query is a (query_id, terms) pair with at most 3 terms — term
#: slots beyond a query's length simply contribute 0
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("spark", "join", "window")),
    (2, ("hash", "table", "scan")),
    (3, ("merge", "sort")),
    (4, ("stream", "batch", "vector")),
)

BM25_TOPK = 10


def bm25_topk(
    docs: DataFrame,
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BM25_QUERIES,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """Top-``topk`` documents per query by the deterministic BM25 score
    (see module docstring for the idf-surrogate rationale)."""
    import re

    from ..caching import persist_tracked
    from ..functions.text import TOKEN_SPLIT_RE

    spark = docs.sparkSession
    # ONE Arrow-batched tokenize pass over the corpus (same tokenizer the
    # oracle's TOKENS_SQL mirrors — the equivalence every shingle oracle
    # already proves).  Each doc emits one length row (t = NULL) plus one
    # row per QUERY term it contains — the corpus text crosses no
    # exchange and is scanned exactly once.  Measured: the pure-Catalyst
    # tokens() expression alone costs ~2 s per pass at sf0.1
    # (array_remove over ~500-element arrays); this pass does tokenize +
    # term counting in ~0.3 s.
    term_list = sorted({t for _, terms in queries for t in terms})

    def _batches(it):
        from collections import Counter

        import pandas as pd

        tok_re = re.compile(TOKEN_SPLIT_RE)
        tset = set(term_list)
        for pdf in it:
            rows = []
            for d, txt in zip(pdf["doc_id"], pdf[text_col]):
                toks = [w for w in tok_re.split((txt or "").lower()) if w]
                rows.append((int(d), None, 0, len(toks)))
                # Counter's C fast path beats a per-token Python loop ~3×
                cnt = Counter(toks)
                rows.extend(
                    (int(d), w, cnt[w], len(toks))
                    for w in tset.intersection(cnt)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "t", "tf", "dl"])

    slim = docs.select("doc_id", text_col)
    target = spark.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    base = persist_tracked(
        slim.mapInPandas(
            _batches, schema="doc_id long, t string, tf long, dl long"
        )
    )

    # corpus scalars from the length rows (a 2-value driver collect, like
    # the IVF codebooks); avgdl = one exact double division of two longs
    n_docs, total_toks = (
        base.filter(F.col("t").isNull())
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .collect()[0]
    )

    q_rows = [
        (qid, slot, term)
        for qid, terms in queries
        for slot, term in enumerate(terms)
    ]
    qdf = spark.createDataFrame(q_rows, "query_id int, slot int, t string")
    tf = base.filter(F.col("t").isNotNull())
    term_df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # (query term, df) is at most |query terms| rows — broadcast the
    # scoring table; the corpus side joins it map-only
    scoring = qdf.join(term_df, "t", "left").na.fill({"df": 0})

    # dl rides on the tf rows — no per-doc length join needed
    matched = tf.join(F.broadcast(scoring), "t")
    # exact expression-order arithmetic (see module docstring)
    idf = (
        (F.lit(n_docs).cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.lit(total_toks).cast("double") / F.lit(n_docs).cast("double")
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    per_term = matched.select(
        "query_id",
        "doc_id",
        "slot",
        (idf * tf_part).alias("s"),
    )
    # fixed-order sum via term slots: s0 + s1 + s2 (never a float fold)
    max_slots = max(len(t) for _, t in queries)
    slots = per_term.groupBy("query_id", "doc_id").agg(
        *[
            F.max(F.when(F.col("slot") == i, F.col("s"))).alias(f"s{i}")
            for i in range(max_slots)
        ]
    )
    total = F.coalesce(F.col("s0"), F.lit(0.0))
    for i in range(1, max_slots):
        total = total + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    scored = slots.select(
        "query_id", "doc_id", F.round(total, 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "doc_id", "score", "rk")
    )


def bm25_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs).orderBy("query_id", "rk")


def _bm25_sql(
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BM25_QUERIES,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> str:
    toks = TOKENS_SQL.format(col="text")
    q_vals = ", ".join(
        f"({qid}, {slot}, '{term}')"
        for qid, terms in queries
        for slot, term in enumerate(terms)
    )
    max_slots = max(len(t) for _, t in queries)
    slot_cols = ", ".join(
        f"max(CASE WHEN slot = {i} THEN s END) AS s{i}"
        for i in range(max_slots)
    )
    total = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(max_slots))
    # literals forced to DOUBLE: DuckDB parses bare decimals as DECIMAL,
    # whose arithmetic would diverge from Spark's double path
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS t FROM documents),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok) AS total_toks),
q(query_id, slot, t) AS (VALUES {q_vals}),
term_df AS (
  SELECT t, count(*) AS df FROM tf
  WHERE t IN (SELECT DISTINCT t FROM q) GROUP BY t
),
scoring AS (
  SELECT q.query_id, q.slot, q.t, COALESCE(term_df.df, 0) AS df
  FROM q LEFT JOIN term_df ON q.t = term_df.t
),
per_term AS (
  SELECT s.query_id, tf.doc_id, s.slot,
         ((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
            / (df + CAST(0.5 AS DOUBLE)))
         * ((tf * CAST({k1 + 1.0!r} AS DOUBLE))
            / (tf + CAST({k1!r} AS DOUBLE)
                    * (CAST({1.0 - b!r} AS DOUBLE)
                       + CAST({b!r} AS DOUBLE)
                         * (dl / (CAST(total_toks AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE))))))
           AS s
  FROM tf JOIN scoring s ON tf.t = s.t
          JOIN dl ON tf.doc_id = dl.doc_id, stats
),
slots AS (
  SELECT query_id, doc_id, {slot_cols}
  FROM per_term GROUP BY query_id, doc_id
),
scored AS (
  SELECT query_id, doc_id, round({total}, 6) AS score FROM slots
)
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT) AS rk
FROM scored
QUALIFY rk <= {topk}
ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# Per-document keyword extraction (tf-idf top terms)
# --------------------------------------------------------------------------

KEYWORDS_TOPK = 3


def tfidf_keywords(
    docs: DataFrame, topk: int = KEYWORDS_TOPK, text_col: str = "text"
) -> DataFrame:
    """Top-``topk`` characteristic terms per document by tf·idf — the
    metadata-enrichment pass (search facets, topic tags) next to BM25's
    per-QUERY retrieval.  Same determinism discipline: the rational idf
    surrogate ``(N-df+0.5)/(df+0.5)`` keeps every arithmetic step
    exactly-rounded IEEE, scores round to 6, ties break on the term.

    Pure Catalyst: one token explode → tf aggregation (keyed by doc,
    term), df aggregation (keyed by term), a hash join on the term, and
    a per-doc ranking window over ≤ |distinct terms per doc| rows."""
    from ..functions.text import tokens

    spark = docs.sparkSession
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("t")
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)
    ) / (F.col("df") + F.lit(0.5))
    scored = tf.join(df_tab, "t").select(
        "doc_id", "t", F.round(F.col("tf") * idf, 6).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("t").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= topk)
        .select("doc_id", "t", "score", "rk")
    )


def keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs).orderBy("doc_id", "rk")


def _keywords_sql(topk: int = KEYWORDS_TOPK) -> str:
    toks = TOKENS_SQL.format(col="text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS t FROM documents),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
dfx AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.t AS t,
         round(tf * ((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
                     / (df + CAST(0.5 AS DOUBLE))), 6) AS score
  FROM tf JOIN dfx ON tf.t = dfx.t, n
)
SELECT doc_id, t, score,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, t ASC) AS INT) AS rk
FROM scored QUALIFY rk <= {topk}
ORDER BY doc_id, rk
"""


# --------------------------------------------------------------------------
# Hybrid retrieval: lexical ∪ semantic candidates fused by RRF
# --------------------------------------------------------------------------

#: fixed query documents (ids present at every scale factor); each plays
#: both roles — its text drives the lexical leg, its embedding (same id
#: space: vec_id == doc_id for embedded docs) the semantic leg
HYBRID_QUERY_IDS = (3, 11, 23, 42)
HYBRID_LEG_K = 20     #: per-leg candidate depth
HYBRID_TOPK = 10      #: fused results per query
RRF_K = 60            #: Cormack/Clarke/Buettcher reciprocal-rank constant


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_ids: tuple[int, ...] = HYBRID_QUERY_IDS,
    leg_k: int = HYBRID_LEG_K,
    topk: int = HYBRID_TOPK,
) -> DataFrame:
    """Hybrid retrieval: per query, the top-``leg_k`` documents by
    LEXICAL similarity (distinct-token overlap with the query text) and
    by SEMANTIC similarity (embedding cosine), fused with reciprocal-rank
    fusion ``Σ 1/(60 + rank)`` — the standard union-of-retrievers shape
    every RAG/training-data pipeline runs (BM25 ∪ ANN → fuse).

    Scale shape: both query sides are broadcast literals (|queries| rows);
    each leg is ONE map-only scoring pass over its corpus followed by a
    skinny per-query top-k window (query_id, doc_id, score — no text or
    vectors cross the rank exchange); the fusion join is candidate-sized
    (≤ 2·leg_k rows per query).  Documents without embeddings simply have
    no semantic leg (realistic: the embedded subset lags the corpus).

    Determinism: overlap is an integer; cosine is the sequential-fold dot
    product rounded to 6 before ranking; ranks tie-break on doc_id; the
    RRF score is a sum of two reciprocals of small integers — bit-equal
    across engines.
    """
    from ..functions.text import tokens
    from .similarity import cosine, with_norm

    # ---- lexical leg: distinct-token overlap ---------------------------
    qtext = docs.filter(F.col("doc_id").isin(*query_ids)).select(
        F.col("doc_id").alias("query_id"), tokens("text").alias("qt")
    )
    lex_scores = (
        docs.select("doc_id", tokens("text").alias("dt"))
        .join(F.broadcast(qtext), F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.size(F.array_intersect("qt", "dt")).alias("overlap"),
        )
        .filter(F.col("overlap") > 0)
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("overlap").desc(), F.col("doc_id")
    )
    lex = (
        lex_scores.withColumn("r_lex", F.row_number().over(w_lex))
        .filter(F.col("r_lex") <= leg_k)
        .select("query_id", "doc_id", "r_lex")
    )

    # ---- semantic leg: cosine over the embedded subset -----------------
    en = with_norm(emb, "embedding")
    qv = en.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    sem_scores = en.join(
        F.broadcast(qv), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            cosine(F.col("qe"), F.col("embedding"), F.col("qn"), F.col("norm2")),
            6,
        ).alias("cos"),
    )
    w_sem = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    sem = (
        sem_scores.withColumn("r_sem", F.row_number().over(w_sem))
        .filter(F.col("r_sem") <= leg_k)
        .select("query_id", "doc_id", "r_sem")
    )

    # ---- RRF fusion ------------------------------------------------------
    fused = (
        lex.join(sem, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(w_f))
        .filter(F.col("rk") <= topk)
        .select(
            "query_id", "doc_id", F.round("rrf", 9).alias("rrf_score"), "rk"
        )
    )


def hybrid_rrf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(docs, emb).orderBy("query_id", "rk")


def _hybrid_rrf_sql() -> str:
    from .similarity import _dot_sql

    toks = TOKENS_SQL.format(col="text")
    dot = _dot_sql("q.embedding", "e.embedding")
    qn = _dot_sql("q.embedding", "q.embedding")
    en = _dot_sql("e.embedding", "e.embedding")
    ids = ", ".join(str(i) for i in HYBRID_QUERY_IDS)
    return f"""
WITH qt AS (
  SELECT doc_id AS query_id, {toks} AS qtok FROM documents
  WHERE doc_id IN ({ids})
),
lex_scores AS (
  SELECT q.query_id, d.doc_id,
         len(list_intersect(q.qtok, {toks})) AS overlap
  FROM qt q JOIN documents d ON d.doc_id != q.query_id
),
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY overlap DESC, doc_id) AS r_lex
  FROM lex_scores WHERE overlap > 0
  QUALIFY r_lex <= {HYBRID_LEG_K}
),
sem_scores AS (
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         round(({dot}) / (sqrt({qn}) * sqrt({en})), 6) AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
  WHERE q.vec_id IN ({ids})
),
sem AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc_id) AS r_sem
  FROM sem_scores
  QUALIFY r_sem <= {HYBRID_LEG_K}
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.r_lex),
                  CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.r_sem),
                      CAST(0.0 AS DOUBLE)) AS rrf
  FROM lex l FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, round(rrf, 9) AS rrf_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id) AS INT) AS rk
FROM fused
QUALIFY rk <= {HYBRID_TOPK}
ORDER BY query_id, rk
"""


SEARCH_QUERIES = {
    "text_bm25_topk": (bm25_query, _bm25_sql()),
    "text_keywords": (keywords_query, _keywords_sql()),
    "search_hybrid_rrf": (hybrid_rrf_query, _hybrid_rrf_sql()),
}
