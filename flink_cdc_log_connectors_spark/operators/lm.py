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

from ..functions.text import TOKENS_SQL, tokens
from ..io import load_table

MIN_BIGRAM_COUNT = 20  #: report bigrams at or above this corpus count


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram counts: one row per adjacent token pair (w1, w2)
    with its occurrence count.  Map-only bigram emission (an array
    ``transform`` over the token array — no per-doc shuffle), then the
    single token-keyed aggregation."""
    tk = tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(0, greatest(size(__tk) - 2, -1)), "
        "i -> concat(__tk[i], ' ', __tk[i + 1]))"
    )
    return (
        df.select(tk.alias("__tk"))
        .select(F.explode(bigrams).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
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
    c12 = bigram_counts(df, text_col=text_col)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct(F.col("w")).alias("v"))
    )
    return (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            (
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("p_smoothed"),
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
    c12 = bigram_counts(df, text_col=text_col)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct(F.col("w")).alias("v"))
    )
    model = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bg"),
            (
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("p"),
        )
    )
    tk = tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(0, greatest(size(__tk) - 2, -1), 1), "
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
