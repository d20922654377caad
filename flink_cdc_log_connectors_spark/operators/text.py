"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (JVM-side, whole-
stage-codegen) — no Python UDFs.  Each operator is embarrassingly parallel
(per-row), so the plans contain no shuffle except final ORDER BY for the
deterministic oracle comparison; at 100 TB they scale linearly with input
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    TOKENS_SQL,
    tokens,
    word_count_in_set,
    word_count_in_set_sql,
)
from ..io import load_table


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + quality ratios per document.

    ``n_tokens`` (whitespace/punct tokenization), ``n_uniq`` (distinct),
    ``stop_cnt`` (stopword hits), ``alpha_chars`` (letter count),
    ``stop_ratio``/``ttr`` as IEEE double divisions (deterministic and
    identical across engines given identical integer inputs).

    All expressions are codegen'd (regexp counts instead of per-token
    lambdas) — map-only pass, no shuffle.
    """
    toks = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        word_count_in_set(text_col, STOPWORDS).alias("stop_cnt"),
        F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")).alias(
            "alpha_chars"
        ),
    ).select(
        "*",
        (F.col("stop_cnt").cast("double") / F.col("n_tokens")).alias("stop_ratio"),
        (F.col("n_uniq").cast("double") / F.col("n_tokens")).alias("ttr"),
    )


def text_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_stats(docs).orderBy("doc_id")


_T = TOKENS_SQL.format(col="text")
_STOP_CNT_SQL = word_count_in_set_sql("text", STOPWORDS)

TEXT_STATS_SQL = f"""
WITH toks AS (SELECT doc_id, text, {_T} AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS INT) AS n_tokens,
       CAST(len(list_distinct(t)) AS INT) AS n_uniq,
       {_STOP_CNT_SQL} AS stop_cnt,
       CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS INT) AS alpha_chars,
       CAST({_STOP_CNT_SQL} AS DOUBLE) / len(t) AS stop_ratio,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
FROM toks ORDER BY doc_id
"""


#: marker words per language for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = marker-word hits per language, highest
    score wins (ties broken by language code order).  One codegen'd regexp
    pass per language — map-only, no shuffle, no lambdas."""
    scores = {
        lang: word_count_in_set(text_col, markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        pred = F.when((scores[lang] == best) & (best > 0), lang).otherwise(pred)
    return df.select(
        "doc_id",
        "lang",
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
        pred.alias("pred_lang"),
    )


def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs).orderBy("doc_id")


_SCORES = {
    lang: word_count_in_set_sql("text", markers)
    for lang, markers in _LANG_MARKERS.items()
}
_BEST = "greatest(" + ", ".join(f"score_{lang}" for lang in _LANG_MARKERS) + ")"
_PRED = "'unknown'"
for _lang in sorted(_LANG_MARKERS, reverse=True):
    _PRED = (
        f"CASE WHEN score_{_lang} = {_BEST} AND {_BEST} > 0 "
        f"THEN '{_lang}' ELSE {_PRED} END"
    )

LANG_ID_SQL = f"""
WITH scored AS (SELECT doc_id, lang,
  {", ".join(f"{sql} AS score_{lang}" for lang, sql in _SCORES.items())}
  FROM documents)
SELECT doc_id, lang, score_en, score_es, score_fr, score_de,
       {_PRED} AS pred_lang
FROM scored ORDER BY doc_id
"""


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of the exact text plus md5 of the
    normalized token stream (whitespace/case-insensitive near-exact key).
    Hash-groupBy on either column is the exact-dedup primitive."""
    toks = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.md5(F.concat_ws(" ", toks)).alias("fp_norm"),
    )


def fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).orderBy("doc_id")


FINGERPRINT_SQL = f"""
SELECT doc_id, md5(text) AS fp_exact,
       md5(array_to_string({_T}, ' ')) AS fp_norm
FROM documents ORDER BY doc_id
"""


def clean_corpus_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data prep pipeline: quality filter → normalized
    exact dedup → survivors with their stats.  One scan feeding map-side
    expressions + a single hash-groupBy on the fingerprint — the shape a
    100 TB corpus-cleaning job takes."""
    docs = load_table(spark, sf_dir, "documents")
    stats = token_stats(docs).join(fingerprint(docs), "doc_id")
    quality = stats.filter((F.col("n_tokens") >= 20) & (F.col("ttr") >= 0.3))
    survivors = (
        quality.groupBy("fp_norm")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        survivors.join(quality, "doc_id")
        .select("doc_id", "n_tokens", "n_uniq", "n_copies")
        .orderBy("doc_id")
    )


CLEAN_CORPUS_SQL = f"""
WITH toks AS (SELECT doc_id, text, {_T} AS t FROM documents),
stats AS (
  SELECT doc_id, text,
         CAST(len(t) AS INT) AS n_tokens,
         CAST(len(list_distinct(t)) AS INT) AS n_uniq,
         CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
         md5(array_to_string(t, ' ')) AS fp_norm
  FROM toks
),
quality AS (SELECT * FROM stats WHERE n_tokens >= 20 AND ttr >= 0.3),
grouped AS (
  SELECT fp_norm, min(doc_id) AS doc_id, count(*) AS n_copies
  FROM quality GROUP BY fp_norm
)
SELECT g.doc_id, q.n_tokens, q.n_uniq, g.n_copies
FROM grouped g JOIN quality q ON g.doc_id = q.doc_id
ORDER BY g.doc_id
"""


TEXT_QUERIES = {
    "text_token_stats": (text_stats_query, TEXT_STATS_SQL),
    "text_lang_id": (lang_id_query, LANG_ID_SQL),
    "text_fingerprint": (fingerprint_query, FINGERPRINT_SQL),
    "pipeline_clean_corpus": (clean_corpus_query, CLEAN_CORPUS_SQL),
}


def bpe_token_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: pre-tokens per doc, distinct pre-tokens, and
    bytes-per-token (the LLM-pipeline quality metric — low values flag
    repetitive/boilerplate text).  Codegen'd regexp pass, map-only."""
    from ..functions.text import bpe_ish_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_ish_tokens(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_bpe"),
            F.size(F.array_distinct(toks)).alias("n_bpe_uniq"),
            F.length("text").alias("n_bytes"),
        )
        .withColumn(
            "bytes_per_token",
            F.round(F.col("n_bytes").cast("double") / F.col("n_bpe"), 4),
        )
        .orderBy("doc_id")
    )


def _bpe_stats_sql() -> str:
    from ..functions.text import bpe_ish_tokens_sql

    t = bpe_ish_tokens_sql("text")
    return f"""
SELECT doc_id,
       CAST(len({t}) AS INT) AS n_bpe,
       CAST(len(list_distinct({t})) AS INT) AS n_bpe_uniq,
       CAST(length(text) AS INT) AS n_bytes,
       round(CAST(length(text) AS DOUBLE) / len({t}), 4) AS bytes_per_token
FROM documents ORDER BY doc_id
"""


TEXT_QUERIES["text_bpe_tokens"] = (bpe_token_stats_query, _bpe_stats_sql())
