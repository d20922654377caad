"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-conscious:

- **Exact** — hash-groupBy on a fingerprint (md5).  One shuffle keyed by
  the 128-bit hash; no skew (hash keys are uniform).
- **Exact n-gram Jaccard** — inverted-index self-join on word-shingles:
  only pairs sharing ≥1 shingle are ever materialized (Jaccard > 0 ⇒ a
  shared shingle, so this is exact, not approximate).  The shuffle is keyed
  by shingle; ``max_shingle_df`` drops ultra-frequent shingles to bound
  skew at scale (a lossy-but-documented knob, off by default).
- **MinHash + LSH** — shingle → 32 minhashes → 8 bands × 4 rows →
  band-bucket self-join for candidates → exact Jaccard verification.
  The scale path: candidate generation touches only band-equal pairs.
- **SimHash** — 64-bit fingerprint; near-dup pairs found by 4×16-bit
  band equality (any pair within Hamming distance 3 shares a band;
  wider distances probabilistically) then exact Hamming verification
  via ``bit_count(xor)``.

Everything is built-in Catalyst expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import ngrams_sql, tokens, word_ngrams
from ..io import load_table

# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# --------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: its md5 fingerprint, the surviving
    (minimum) id, and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).orderBy("keep_id")


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


# --------------------------------------------------------------------------
# Shingling + exact n-gram Jaccard via inverted index
# --------------------------------------------------------------------------


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) rows of distinct word n-grams per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (jaccard >= num/den) via inverted index.

    The threshold test is done in integer cross-multiplication
    (``den*common >= num*union``) — no float comparisons; the reported
    ``jaccard`` is a single IEEE division (cross-engine deterministic).
    """
    sh = shingles(df, n, text_col, id_col)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    return (
        common.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(s2, F.col("d2") == F.col("s2.doc_id"))
        .withColumn("union_sz", F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("common"))
        .filter(F.lit(threshold_den) * F.col("common") >= F.lit(threshold_num) * F.col("union_sz"))
        .select(
            "d1",
            "d2",
            "common",
            "union_sz",
            (F.col("common").cast("double") / F.col("union_sz")).alias("jaccard"),
        )
    )


def dedup_ngram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold_num=1, threshold_den=5).orderBy(
        "d1", "d2"
    )


DEDUP_NGRAM_SQL = f"""
WITH tri AS (
  SELECT doc_id, unnest({ngrams_sql("text", 3)}) AS sh FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
  FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, common, s1.n_sh + s2.n_sh - common AS union_sz,
       CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
FROM common JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE 5 * common >= 1 * (s1.n_sh + s2.n_sh - common)
ORDER BY d1, d2
"""


# --------------------------------------------------------------------------
# MinHash + LSH (candidate generation at scale) + exact verification
# --------------------------------------------------------------------------

NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """32 minhash values per doc; hash_i(s) = xxhash64(i, s) (seeded,
    deterministic).  Partial aggregation makes this one map-side-combined
    shuffle on doc_id."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(NUM_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Band-bucket self-join: pairs agreeing on at least one band."""
    bands = sig.select(
        "doc_id",
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            ).alias(f"band{b}")
            for b in range(BANDS)
        ],
    )
    melted = bands.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("bh"))
                    for b in range(BANDS)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band_idx", "e.bh")
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates, then EXACT Jaccard verification on the candidates
    only (array_intersect on per-doc shingle sets).  Probabilistic recall
    from banding; verified pairs carry exact similarities."""
    sh = shingles(df, n, text_col, id_col)
    cand = lsh_candidates(minhash_signatures(sh))
    doc_sets = sh.groupBy("doc_id").agg(F.collect_set("sh").alias("shset"))
    d1 = doc_sets.alias("d1")
    d2 = doc_sets.alias("d2")
    return (
        cand.join(d1, cand.d1 == F.col("d1.doc_id"))
        .join(d2, cand.d2 == F.col("d2.doc_id"))
        .withColumn(
            "common", F.size(F.array_intersect(F.col("d1.shset"), F.col("d2.shset")))
        )
        .withColumn(
            "union_sz",
            F.size(F.col("d1.shset")) + F.size(F.col("d2.shset")) - F.col("common"),
        )
        .filter(
            F.lit(threshold_den) * F.col("common")
            >= F.lit(threshold_num) * F.col("union_sz")
        )
        .select(
            "d1.doc_id",
            "d2.doc_id",
            "common",
            "union_sz",
            (F.col("common").cast("double") / F.col("union_sz")).alias("jaccard"),
        )
        .toDF("d1", "d2", "common", "union_sz", "jaccard")
    )


def dedup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs).orderBy("d1", "d2")


# --------------------------------------------------------------------------
# SimHash (64-bit) + banded Hamming pairs
# --------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct tokens (xxhash64 token hashes; each bit
    position accumulates +1/-1; sign → fingerprint bit)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    fp_expr = " + ".join(
        f"shiftleft(cast(b{j} > 0 as bigint), {j})" for j in range(64)
    )
    return bit_sums.select("doc_id", F.expr(fp_expr).alias("simhash"))


def simhash_pairs(
    fp: DataFrame, max_hamming: int = 4
) -> DataFrame:
    """Near-dup pairs by banded fingerprint join + exact Hamming filter.

    4 bands of 16 bits: any pair with Hamming ≤ 3 is guaranteed a band
    match; larger distances are found with decreasing probability.
    """
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.k", "e.band")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(simhash(docs)).orderBy("d1", "d2")


DEDUP_QUERIES = {
    "dedup_exact": (dedup_exact_query, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_query, DEDUP_NGRAM_SQL),
    # Banding is probabilistic — no ANSI-SQL oracle; driver records rows-only.
    "dedup_minhash_lsh": (dedup_minhash_query, None),
    "dedup_simhash": (dedup_simhash_query, None),
}
