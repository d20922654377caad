"""Count-based n-gram language-model estimation over the corpus.

The distributed-LM-training shape of Brants et al., "Large Language
Models in Machine Translation" (EMNLP 2007): n-gram counting is ONE
token-keyed shuffle (groupBy with map-side partials); context counts are
derived from the n-gram counts themselves (a second, already-tiny
aggregate); the vocabulary size is a 1-row broadcast.  The corpus is
touched exactly once.

Cross-engine determinism: counts are integers; the only float is the
final smoothed probability ``(c12+1)/(c1+V)`` — a single IEEE-754 double
division of two exact integers, correctly rounded identically in Spark
and DuckDB (no transcendental log-probs, which could differ in the last
ulp between libm implementations).

Reference scope note: the reference engine (flink-cdc-log-connectors)
delegates all query-layer analytics to Flink SQL; this module is part of
the beyond-reference LLM-data-pipeline surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import TOKENS_SQL, tokens
from ..io import load_table
from .curation import PACK_CAP as CONTEXT_LEN
from .curation import PACK_SHARDS

MIN_BIGRAM_COUNT = 20  #: report bigrams at or above this corpus count


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram counts: one row per adjacent token pair (w1, w2)
    with its occurrence count.  Map-only bigram emission (an array
    ``transform`` over the token array — no per-doc shuffle), then the
    single token-keyed aggregation."""
    tk = tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(0, size(__tk) - 2), "
        "i -> concat(__tk[i], ' ', __tk[i + 1]))"
    )
    return (
        df.select(tk.alias("__tk"))
        # docs with < 2 tokens have no bigrams; the guard also prevents
        # sequence(0, -1) from generating a DESCENDING index list (Spark
        # sequence semantics) and indexing out of bounds
        .filter(F.size("__tk") >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def _bigram_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The shared add-one bigram model table: one row per observed
    bigram with (w1, w2, c12, c1, p) where ``p = (c12+1)/(c1+V)`` — the
    single definition both the trainer view (:func:`bigram_lm`) and the
    per-doc scorer (:func:`doc_bigram_bits`) project from, so the
    smoothing arithmetic and its float discipline live in ONE place."""
    c12 = bigram_counts(df, text_col=text_col)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct(F.col("w")).alias("v"))
    )
    return (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            (
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("p"),
        )
    )


def bigram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = MIN_BIGRAM_COUNT
) -> DataFrame:
    """Add-one-smoothed bigram LM estimates for the corpus's frequent
    bigrams: ``P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V)`` where ``c(w1·)``
    is the total bigram-context count of ``w1`` and ``V`` the unigram
    vocabulary size.

    The context counts come from re-aggregating the (already vocabulary-
    sized) bigram-count table — never the corpus — and V is a 1-row
    aggregate broadcast into the final projection (the documented 1-row
    crossJoin class)."""
    return (
        _bigram_model(df, text_col=text_col)
        .filter(F.col("c12") >= min_count)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("p").alias("p_smoothed"),
        )
        .orderBy("w1", "w2")
    )


def bigram_lm_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm(docs)


def _bigram_lm_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH toks AS (SELECT {t} AS tk FROM documents),
bg AS (
  SELECT tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest({t}) AS w FROM documents)
)
SELECT c12.w1, c12.w2,
       CAST(c12.c12 AS BIGINT) AS c12,
       CAST(c1.c1 AS BIGINT) AS c1,
       CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE)
         AS p_smoothed
FROM c12 JOIN c1 USING (w1), vocab
WHERE c12.c12 >= {MIN_BIGRAM_COUNT}
ORDER BY w1, w2
"""


LM_QUERIES = {
    "lm_bigram_train": (bigram_lm_query, _bigram_lm_sql()),
}


def doc_bigram_bits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document bits-per-bigram under the corpus's add-one bigram LM
    — the CONTEXTUAL quality score one step up from the unigram
    cross-entropy proxy (``operators/text.unigram_cross_entropy``): a
    doc of individually-common but incoherently-ordered tokens scores
    high here and normal there, which is exactly the gibberish/spam
    signature the unigram filter misses.

    Plan: the bigram model table (vocabulary-sized: c12 enriched with
    its context count and V) is built once; the corpus's per-doc bigram
    stream joins it on the single bigram-string key — ONE corpus-sized
    keyed shuffle, the same discipline as the unigram scorer.  Docs with
    fewer than 2 tokens have no bigrams and are absent from the output
    (documented; callers union them back with a sentinel if needed).

    Float discipline: identical to the unigram scorer — ``log2`` has no
    cross-engine correctly-rounded guarantee and the per-doc average
    folds in nondeterministic order, so scores are rounded to 6
    decimals (ulp noise is ~10 orders below the grain)."""
    model = _bigram_model(df, text_col=text_col).select(
        F.concat_ws(" ", "w1", "w2").alias("bg"), "p"
    )
    tk = tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(0, size(__tk) - 2), "
        "i -> concat(__tk[i], ' ', __tk[i + 1]))"
    )
    doc_bg = (
        df.select(F.col(id_col), tk.alias("__tk"))
        .filter(F.size("__tk") >= 2)
        .select(id_col, F.explode(bigrams).alias("bg"))
    )
    bits = -F.log2(F.col("p"))
    return (
        doc_bg.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(bits), 6).alias("bits_per_bigram"),
            F.round(F.max(bits), 6).alias("max_bits"),
        )
    )


def doc_bigram_bits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return doc_bigram_bits(docs).orderBy("doc_id")


def _doc_bigram_bits_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH toks AS (SELECT doc_id, {t} AS tk FROM documents),
bg AS (
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS bg
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY bg),
c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1
  FROM c12 GROUP BY 1
),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest({t}) AS w FROM documents)
),
model AS (
  SELECT c12.bg,
         CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE) AS p
  FROM c12 JOIN c1 ON split_part(c12.bg, ' ', 1) = c1.w1, vocab
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(avg(-log2(p)), 6) AS bits_per_bigram,
       round(max(-log2(p)), 6) AS max_bits
FROM bg JOIN model USING (bg)
GROUP BY doc_id
ORDER BY doc_id
"""


LM_QUERIES["lm_doc_bigram_bits"] = (
    doc_bigram_bits_query,
    _doc_bigram_bits_sql(),
)


# --------------------------------------------------------------------------
# Stupid backoff (Brants et al. 2007) trigram scoring
# --------------------------------------------------------------------------

SB_ALPHA = 0.4  #: the paper's fixed backoff factor
SB_TOP_UNIGRAMS = 15  #: candidate alphabet: top-N unigrams by count


def stupid_backoff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scores over a deterministic candidate set —
    the actual web-scale LM scoring rule of Brants et al., "Large
    Language Models in Machine Translation" (EMNLP 2007): relative
    frequencies with a fixed 0.4 backoff instead of normalized
    smoothing (the paper's point: at corpus scale the unnormalized
    score works as well and needs no iterative discount estimation —
    ideal for one-pass distributed counting).

        S(w3|w1 w2) = c123/c12           if c123 > 0
                    = 0.4 * S(w3|w2)     otherwise
        S(w3|w2)    = c23/c2             if c23 > 0
                    = 0.4 * c3/N         otherwise

    Candidates are the cross product of the corpus's top-15 unigrams
    (3375 trigrams — observed, partially-observed AND unseen combos, so
    all three backoff tiers execute and are value-checked).  Scale:
    n-gram counting is the same single-corpus-shuffle shape as
    ``bigram_counts``; the candidate side is constant-sized (two
    broadcast self-joins of a 15-row table).  Floats: each tier is one
    IEEE division of exact integers, optionally times the 0.4 literal —
    identical in both engines, no rounding needed."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    base = docs.select(tk.alias("__tk"))

    def ngram_arr(n: int) -> str:
        # tokens are [a-z0-9]+ so the space join is unambiguous; the
        # case guard keeps sequence() ascending for docs shorter than n
        # (see bigram_counts) without needing a per-order filter pass
        joined = ", ".join(f"__tk[i + {j}]" for j in range(n))
        return (
            f"case when size(__tk) >= {n} then "
            f"transform(sequence(0, size(__tk) - {n}), "
            f"i -> concat('{n}:', concat_ws(' ', {joined}))) "
            "else array() end"
        )

    # ONE corpus scan emits all three n-gram orders (tagged "n:gram");
    # one token-keyed shuffle counts them, and the vocabulary-sized
    # result is pinned (localCheckpoint) so the per-order slices below
    # never re-touch the corpus (bench: replacing the three separate
    # scan+shuffle passes measured 2.8 s → 2.3 s steady at sf0.1; the
    # remaining cost is the count shuffle + model joins, not scans)
    counts = (
        base.select(
            F.explode(
                F.expr(
                    f"concat({ngram_arr(1)}, {ngram_arr(2)}, {ngram_arr(3)})"
                )
            ).alias("tg")
        )
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.split_part(F.col("tg"), F.lit(":"), F.lit(1)).alias("n"),
            F.substring_index(F.col("tg"), ":", -1).alias("g"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )

    def order_counts(n: int, cols: list[str], cnt: str) -> DataFrame:
        parts = [
            F.split_part(F.col("g"), F.lit(" "), F.lit(j + 1)).alias(c)
            for j, c in enumerate(cols)
        ]
        return counts.filter(F.col("n") == str(n)).select(
            *parts, F.col("cnt").alias(cnt)
        )

    uni = order_counts(1, ["w"], "c1")
    n_total = uni.agg(F.sum("c1").alias("n")).collect()[0]["n"]
    bi = order_counts(2, ["a", "b"], "c2g")
    tri = order_counts(3, ["a", "b", "c"], "c3g")
    top = (
        uni.orderBy(F.desc("c1"), F.asc("w"))
        .limit(SB_TOP_UNIGRAMS)
        .select("w")
    )
    cand = (
        top.select(F.col("w").alias("w1"))
        .crossJoin(F.broadcast(top.select(F.col("w").alias("w2"))))
        .crossJoin(F.broadcast(top.select(F.col("w").alias("w3"))))
    )
    j = (
        cand.join(
            tri,
            (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b"))
            & (F.col("w3") == F.col("c")),
            "left",
        )
        .drop("a", "b", "c")
        .join(
            bi.select(
                F.col("a").alias("ba"), F.col("b").alias("bb"),
                F.col("c2g").alias("c12"),
            ),
            (F.col("w1") == F.col("ba")) & (F.col("w2") == F.col("bb")),
            "left",
        )
        .drop("ba", "bb")
        .join(
            bi.select(
                F.col("a").alias("ca"), F.col("b").alias("cb"),
                F.col("c2g").alias("c23"),
            ),
            (F.col("w2") == F.col("ca")) & (F.col("w3") == F.col("cb")),
            "left",
        )
        .drop("ca", "cb")
        .join(
            uni.select(F.col("w").alias("u2"), F.col("c1").alias("c2u")),
            F.col("w2") == F.col("u2"),
            "left",
        )
        .drop("u2")
        .join(
            uni.select(F.col("w").alias("u3"), F.col("c1").alias("c3u")),
            F.col("w3") == F.col("u3"),
            "left",
        )
        .drop("u3")
    )
    s_bigram = F.when(
        F.col("c23").isNotNull(),
        F.col("c23").cast("double") / F.col("c2u").cast("double"),
    ).otherwise(
        F.lit(SB_ALPHA)
        * F.coalesce(F.col("c3u"), F.lit(0)).cast("double")
        / F.lit(float(n_total))
    )
    score = F.when(
        F.col("c3g").isNotNull(),
        F.col("c3g").cast("double") / F.col("c12").cast("double"),
    ).otherwise(F.lit(SB_ALPHA) * s_bigram)
    return (
        j.select(
            "w1",
            "w2",
            "w3",
            F.coalesce(F.col("c3g"), F.lit(0)).cast("long").alias("c123"),
            score.alias("score"),
        )
        .orderBy("w1", "w2", "w3")
    )


def _stupid_backoff_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH toks AS (SELECT {t} AS tk FROM documents),
uni AS (
  SELECT w, COUNT(*) AS c1 FROM (SELECT unnest(tk) AS w FROM toks)
  GROUP BY w
),
nt AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n FROM uni),
bi AS (
  SELECT tk[i] AS a, tk[i + 1] AS b, COUNT(*) AS c2g
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
  GROUP BY 1, 2
),
tri AS (
  SELECT tk[i] AS a, tk[i + 1] AS b, tk[i + 2] AS c, COUNT(*) AS c3g
  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
  GROUP BY 1, 2, 3
),
top AS (
  SELECT w FROM uni ORDER BY c1 DESC, w LIMIT {SB_TOP_UNIGRAMS}
),
cand AS (
  SELECT t1.w AS w1, t2.w AS w2, t3.w AS w3
  FROM top t1, top t2, top t3
),
j AS (
  SELECT cand.w1, cand.w2, cand.w3, tri.c3g, b12.c2g AS c12,
         b23.c2g AS c23, u2.c1 AS c2u, u3.c1 AS c3u
  FROM cand
  LEFT JOIN tri ON cand.w1 = tri.a AND cand.w2 = tri.b AND cand.w3 = tri.c
  LEFT JOIN bi b12 ON cand.w1 = b12.a AND cand.w2 = b12.b
  LEFT JOIN bi b23 ON cand.w2 = b23.a AND cand.w3 = b23.b
  LEFT JOIN uni u2 ON cand.w2 = u2.w
  LEFT JOIN uni u3 ON cand.w3 = u3.w
)
SELECT w1, w2, w3,
       CAST(COALESCE(c3g, 0) AS BIGINT) AS c123,
       CASE WHEN c3g IS NOT NULL
            THEN CAST(c3g AS DOUBLE) / CAST(c12 AS DOUBLE)
            ELSE {SB_ALPHA} * (
              CASE WHEN c23 IS NOT NULL
                   THEN CAST(c23 AS DOUBLE) / CAST(c2u AS DOUBLE)
                   ELSE {SB_ALPHA} * CAST(COALESCE(c3u, 0) AS DOUBLE)
                        / (SELECT n FROM nt)
              END)
       END AS score
FROM j
ORDER BY w1, w2, w3
"""


LM_QUERIES["lm_stupid_backoff"] = (
    stupid_backoff_query,
    _stupid_backoff_sql(),
)


# -- sequence packing ---------------------------------------------------------


def sequence_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    context_len: int = CONTEXT_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Concat-then-chunk SEQUENCE PACKING — map each document to its
    position in the fixed-length token sequences an LM pretraining run
    consumes (all docs concatenated in id order, sliced every
    ``context_len`` tokens; a doc may span a sequence boundary).  Output
    one row per doc: its shard, token count, the global sequence index
    range it occupies within the shard, and its offset inside the first
    sequence — the manifest a downstream tokenizer/writer needs to
    materialize shard files without re-scanning text.

    The PER-DOC grain of the same placement ``corpus_pack_sequences``
    (``operators/curation.py``) audits at PER-SHARD grain — same
    constants by construction, so that entry is exactly ``GROUP BY
    shard`` over this one (asserted in
    ``tests/test_graph_lm_reservoir.py``): the audit view tells the
    engineer whether the layout is acceptable, this manifest is what the
    shard writer then consumes.

    Scale: a single global running sum would serialize the corpus
    through ONE window partition — the classic 100 TB failure.  Packing
    is instead done per SHARD (``id % n_shards``), the shape real
    pipelines use (each shard becomes one output file sequence): the
    running sum parallelizes across shards, each shard's window is
    1/n_shards of the corpus, and determinism is preserved (shard and
    order are pure functions of the id).  Raise n_shards with corpus
    size — at 100 TB, thousands of shards, each a few GB.
    """
    n = F.size(tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        n.alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "shard",
        "doc_id",
        "n_tokens",
        F.floor(off / context_len).cast("bigint").alias("start_seq"),
        F.floor((off + F.col("n_tokens") - 1) / context_len)
        .cast("bigint")
        .alias("end_seq"),
        F.pmod(off, F.lit(context_len)).cast("bigint").alias("seq_offset"),
    )


def sequence_pack_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sequence_pack(docs).orderBy("doc_id")


def _sequence_pack_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
         len({t}) AS n_tokens
  FROM documents
),
r AS (
  SELECT shard, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS off
  FROM t WHERE n_tokens >= 1
)
SELECT shard, doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(off // {CONTEXT_LEN} AS BIGINT) AS start_seq,
       CAST((off + n_tokens - 1) // {CONTEXT_LEN} AS BIGINT) AS end_seq,
       CAST(off % {CONTEXT_LEN} AS BIGINT) AS seq_offset
FROM r ORDER BY doc_id
"""


LM_QUERIES["lm_sequence_pack"] = (sequence_pack_query, _sequence_pack_sql())
