"""Corpus curation operators: cross-source overlap, quality bucketing,
token-budget mix planning.

The decisions a training-data pipeline makes ABOVE the document level:
how much two crawls/sources duplicate each other (contamination and
mix-deduplication budgeting), which quality stratum each document falls
in (CCNet-style head/middle/tail by LM-score proxy), and what per-source
sampling rates hit a global token budget.  All pure-Catalyst or
sketch-level plans; every entry carries a full DuckDB value oracle.

Scale notes per operator are inline; the common discipline: per-source
state is SKETCHES (k hashes) or SCALARS (token counts), so the
cross-source stages touch O(sources²·k) rows regardless of corpus size —
only the first pass scans the corpus, map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

# --------------------------------------------------------------------------
# Pairwise source overlap via KMV sketches (contamination estimation)
# --------------------------------------------------------------------------

OVERLAP_K = 64

#: 2^60 as double — md5-60 hash-space size for KMV normalization
_HASH_SPACE = float(1 << 60)


def source_overlap_kmv(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = OVERLAP_K,
) -> DataFrame:
    """Estimated pairwise content overlap between sources via KMV set
    sketches over document-content hashes (md5-60 of the text).

    For each source pair the k smallest hashes of the UNION give the
    union-cardinality estimate ``(k-1)/kth_min_normalized``; the fraction
    of those union-k hashes present in BOTH sources estimates Jaccard;
    their product estimates ``|A ∩ B|`` — the standard KMV set-operation
    estimators (Beyer et al., "On Synopses for Distinct-Value Estimation
    Under Multiset Operations", SIGMOD'07), fully deterministic here
    (md5 order, no RNG) and therefore value-oracle-checkable.

    Scale: one corpus scan builds per-source sketches (ranking window on
    uniform hash keys, k rows survive per source); everything after
    touches k·sources rows — the pairwise stage is sketch-level, never
    corpus-level, so 100 TB and 100 MB cost the same past the first scan.
    The sketch join is a documented tiny-broadcast (k·sources rows).
    """
    hv = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    )
    d = df.select(F.col(group_col).alias("s"), hv).distinct()
    w = Window.partitionBy("s").orderBy("hv")
    kept = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("s", "hv")
    )
    srcs = kept.select("s").distinct()
    pairs = (
        srcs.select(F.col("s").alias("sa"))
        .join(srcs.select(F.col("s").alias("sb")), F.col("sa") < F.col("sb"))
    )
    merged = pairs.join(
        F.broadcast(kept),
        (F.col("s") == F.col("sa")) | (F.col("s") == F.col("sb")),
    )
    per_hv = merged.groupBy("sa", "sb", "hv").agg(
        F.count(F.lit(1)).alias("ns")  # kept rows are distinct per source
    )
    w2 = Window.partitionBy("sa", "sb").orderBy("hv")
    union_k = per_hv.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= k
    )
    agg = union_k.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("hv").alias("__kth"),
        F.sum(F.when(F.col("ns") == 2, 1).otherwise(0))
        .cast("long").alias("matches"),
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("__kth").cast("double") / F.lit(_HASH_SPACE))
    )
    est_j = F.col("matches").cast("double") / F.col("n_kept")
    return agg.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_kept",
        "matches",
        F.round(est_j, 6).alias("est_jaccard"),
        F.round(est_j * est_union, 4).alias("est_common_docs"),
    )


def source_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_kmv(docs).orderBy("source_a", "source_b")


OVERLAP_SQL = f"""
WITH d AS (
  SELECT DISTINCT source AS s,
         ('0x' || substring(md5(text), 1, 15))::BIGINT AS hv
  FROM documents
),
kept AS (
  SELECT s, hv FROM (
    SELECT s, hv, row_number() OVER (PARTITION BY s ORDER BY hv) AS rn
    FROM d) WHERE rn <= {OVERLAP_K}
),
srcs AS (SELECT DISTINCT s FROM kept),
pairs AS (
  SELECT a.s AS sa, b.s AS sb FROM srcs a JOIN srcs b ON a.s < b.s
),
merged AS (
  SELECT p.sa, p.sb, k.hv, count(*) AS ns
  FROM pairs p JOIN kept k ON k.s = p.sa OR k.s = p.sb
  GROUP BY p.sa, p.sb, k.hv
),
union_k AS (
  SELECT sa, sb, hv, ns FROM (
    SELECT sa, sb, hv, ns,
           row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn
    FROM merged) WHERE rn <= {OVERLAP_K}
),
agg AS (
  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_kept, max(hv) AS kth,
         CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT) AS matches
  FROM union_k GROUP BY sa, sb
)
SELECT sa AS source_a, sb AS source_b, n_kept, matches,
       round(CAST(matches AS DOUBLE) / n_kept, 6) AS est_jaccard,
       round((CAST(matches AS DOUBLE) / n_kept)
             * (CASE WHEN n_kept < {OVERLAP_K} THEN CAST(n_kept AS DOUBLE)
                     ELSE CAST({OVERLAP_K - 1} AS DOUBLE)
                          / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
                END), 4) AS est_common_docs
FROM agg ORDER BY source_a, source_b
"""


# --------------------------------------------------------------------------
# CCNet-style quality buckets (head / middle / tail by LM-score proxy)
# --------------------------------------------------------------------------


def quality_buckets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail quality strata: ntile(3) over the
    unigram cross-entropy score (the perplexity proxy CCNet buckets on),
    deterministic tie-break by doc_id.

    Scale: reuses the cross-entropy plan (one token-keyed shuffle + one
    doc rollup), then ONE ranking window per language — the global sort
    is per-language, which is the exact CCNet sharding."""
    from .text import unigram_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    xent = unigram_cross_entropy(docs)
    j = docs.select("doc_id", "lang").join(xent, "doc_id")
    w = Window.partitionBy("lang").orderBy("bits_per_token", "doc_id")
    b = j.withColumn("bucket", F.ntile(3).over(w))
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("bits_per_token"), 6).alias("avg_bits"),
            F.round(F.min("bits_per_token"), 6).alias("min_bits"),
            F.round(F.max("bits_per_token"), 6).alias("max_bits"),
        )
        .orderBy("lang", "bucket")
    )


def _quality_buckets_sql() -> str:
    from ..functions.text import TOKENS_SQL

    t = "unnest(" + TOKENS_SQL.format(col="text") + ")"
    return f"""
WITH tok AS (SELECT doc_id, {t} AS t FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
xent AS (
  SELECT doc_id,
         round(avg(-log2(CAST(c AS DOUBLE) / (SELECT n FROM total))), 6)
           AS bits_per_token
  FROM tok JOIN freq USING (t) GROUP BY doc_id
),
b AS (
  SELECT d.lang, x.bits_per_token,
         CAST(ntile(3) OVER (PARTITION BY d.lang
                             ORDER BY x.bits_per_token, x.doc_id) AS INT)
           AS bucket
  FROM xent x JOIN documents d USING (doc_id)
)
SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(bits_per_token), 6) AS avg_bits,
       round(min(bits_per_token), 6) AS min_bits,
       round(max(bits_per_token), 6) AS max_bits
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


# --------------------------------------------------------------------------
# Token-budget mix planning (per-source sampling rates for a target budget)
# --------------------------------------------------------------------------


def token_budget_mix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan for an equal-allocation token budget of
    half the corpus: each source's target is ``total_tokens / 2 /
    n_sources``; sources smaller than their target keep everything
    (rate 1.0), larger ones sample down — the uniform-mix first cut a
    data-mix pipeline starts from before importance reweighting.

    Scale: one corpus scan with map-side token counting, one tiny
    per-source aggregate, window totals over the (sources)-sized result.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    tot = F.sum("n_tokens").over(w)
    n_src = F.count(F.lit(1)).over(w)
    target = tot.cast("double") / 2.0 / n_src.cast("double")
    rate = F.least(F.lit(1.0), target / F.col("n_tokens").cast("double"))
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("n_tokens").cast("double"))
        .cast("long").alias("expected_tokens"),
    ).orderBy("source")


def _token_budget_sql() -> str:
    from ..functions.text import TOKENS_SQL

    t = TOKENS_SQL.format(col="text")
    return f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({t})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       round(least(1.0, (sum(n_tokens) OVER () / 2.0 / count(*) OVER ())
                        / n_tokens), 6) AS sample_rate,
       CAST(floor(least(1.0, (sum(n_tokens) OVER () / 2.0 / count(*) OVER ())
                             / n_tokens) * n_tokens) AS BIGINT)
         AS expected_tokens
FROM per_src ORDER BY source
"""


CURATION_QUERIES = {
    "corpus_overlap_kmv": (source_overlap_query, OVERLAP_SQL),
    "corpus_quality_buckets": (quality_buckets_query, _quality_buckets_sql()),
    "corpus_token_budget_mix": (token_budget_mix_query, _token_budget_sql()),
}


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk training batch layout)
# --------------------------------------------------------------------------

PACK_CAP = 512  #: tokens per packed training sequence
PACK_SHARDS = 8  #: independent packing streams


def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing plan: documents are concatenated
    in deterministic order and chunked into fixed ``PACK_CAP``-token
    training sequences (the standard GPT-style packing layout, where a
    document may span a sequence boundary).  Packing is per-SHARD
    (``doc_id % PACK_SHARDS``) — the 100 TB formulation, since a single
    global concatenation order would serialize the cumulative sum; shards
    pack independently and in parallel.

    Output per shard: documents, tokens, packed sequences, how many
    documents straddle a sequence boundary and the padding wasted in the
    final partial sequence — the numbers a training-data engineer checks
    before writing shards.

    Scale: one map-only token count, one window cumulative sum
    PARTITIONED BY shard (each shard's running sum is an independent
    stream — with more shards than cores this is embarrassingly
    parallel), one 8-row aggregation.  Nothing global, nothing quadratic.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = per_doc.select(
        "shard",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("offset"),
    ).select(
        "shard",
        "n_tok",
        F.floor(F.col("offset") / PACK_CAP).alias("start_seq"),
        F.floor((F.col("offset") + F.col("n_tok") - 1) / PACK_CAP).alias(
            "end_seq"
        ),
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            (F.max("end_seq") + 1).cast("long").alias("n_seqs"),
            F.sum((F.col("end_seq") > F.col("start_seq")).cast("long"))
            .cast("long")
            .alias("n_spanning"),
            ((F.max("end_seq") + 1) * PACK_CAP - F.sum("n_tok"))
            .cast("long")
            .alias("pad_tokens"),
        )
        .orderBy("shard")
    )


def _pack_sequences_sql() -> str:
    from ..functions.text import TOKENS_SQL

    t = TOKENS_SQL.format(col="text")
    cap, shards = PACK_CAP, PACK_SHARDS
    return f"""
WITH per_doc AS (
  SELECT doc_id, doc_id % {shards} AS shard, len({t}) AS n_tok
  FROM documents
  WHERE len({t}) > 0
),
placed AS (
  SELECT shard, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tok AS off
  FROM per_doc
),
seqd AS (
  SELECT shard, n_tok,
         CAST(floor(off / {cap}) AS BIGINT) AS start_seq,
         CAST(floor((off + n_tok - 1) / {cap}) AS BIGINT) AS end_seq
  FROM placed
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(max(end_seq) + 1 AS BIGINT) AS n_seqs,
       CAST(sum(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spanning,
       CAST((max(end_seq) + 1) * {cap} - sum(n_tok) AS BIGINT) AS pad_tokens
FROM seqd GROUP BY shard ORDER BY shard
"""


CURATION_QUERIES["corpus_pack_sequences"] = (
    pack_sequences_query,
    _pack_sequences_sql(),
)


# --------------------------------------------------------------------------
# Train/val split leakage audit (near-dup contamination across the split)
# --------------------------------------------------------------------------


def split_leakage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split + NEAR-DUP leakage audit: a
    random split leaks whenever two near-duplicate documents land on
    opposite sides — the val half of such a pair is effectively training
    data, and dedup-after-split cannot fix it.  This is the check a
    pipeline runs BEFORE freezing a split.

    Split assignment is the engine's standard md5-bucket rule (stable
    across engines and runs); near-dup pairs come from the shared
    process-cached exact-Jaccard pair set (same 1/5 threshold as the
    dedup family reports).  Output per split: documents, within-split
    near-dup pairs, cross-split (leaked) pairs, and how many of this
    split's documents are contaminated (have a near-dup on the other
    side).

    Scale: pair generation is the cached inverted-index join (nothing
    quadratic); the audit itself is two skinny joins keyed by doc_id and
    per-split aggregations.  The cross-pair count is computed from the
    per-side rows — no driver-side scalars, no 1-row cross joins."""
    from .dedup import cached_ngram_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 10
    )
    assign = docs.select(
        "doc_id",
        F.when(bucket < 9, F.lit("train")).otherwise(F.lit("val")).alias(
            "split"
        ),
    )
    pairs = cached_ngram_pairs(spark, sf_dir).select("d1", "d2")
    j = (
        pairs.join(
            assign.select(
                F.col("doc_id").alias("d1"), F.col("split").alias("s1")
            ),
            "d1",
        ).join(
            assign.select(
                F.col("doc_id").alias("d2"), F.col("split").alias("s2")
            ),
            "d2",
        )
    )
    sides = j.select(
        F.col("d1").alias("doc"), F.col("s1").alias("own"),
        F.col("s2").alias("other"),
    ).unionAll(
        j.select(
            F.col("d2").alias("doc"), F.col("s2").alias("own"),
            F.col("s1").alias("other"),
        )
    )
    n_docs = assign.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    within = (
        j.filter(F.col("s1") == F.col("s2"))
        .groupBy(F.col("s1").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("pairs_within"))
    )
    cross = (
        sides.filter(F.col("own") != F.col("other"))
        .groupBy(F.col("own").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("pairs_cross"))
    )
    contaminated = (
        sides.filter(F.col("own") != F.col("other"))
        .select("doc", "own")
        .distinct()
        .groupBy(F.col("own").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("contaminated_docs"))
    )
    out = (
        n_docs.join(within, "split", "left")
        .join(cross, "split", "left")
        .join(contaminated, "split", "left")
        .na.fill(
            {"pairs_within": 0, "pairs_cross": 0, "contaminated_docs": 0}
        )
    )
    return out.orderBy("split")


def _split_leakage_sql() -> str:
    from .dedup import NGRAM_KEPT_CTE

    return f"""
WITH {NGRAM_KEPT_CTE},
pairs AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE 5 * common >= (s1.n_sh + s2.n_sh - common)
),
assign AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10 < 9
              THEN 'train' ELSE 'val' END AS split
  FROM documents
),
j AS (
  SELECT p.d1, p.d2, a1.split AS s1, a2.split AS s2
  FROM pairs p
  JOIN assign a1 ON p.d1 = a1.doc_id
  JOIN assign a2 ON p.d2 = a2.doc_id
),
sides AS (
  SELECT d1 AS doc, s1 AS own, s2 AS other FROM j
  UNION ALL
  SELECT d2, s2, s1 FROM j
),
n_docs AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs
           FROM assign GROUP BY split),
within AS (SELECT s1 AS split, CAST(count(*) AS BIGINT) AS pairs_within
           FROM j WHERE s1 = s2 GROUP BY s1),
crossed AS (SELECT own AS split, CAST(count(*) AS BIGINT) AS pairs_cross
            FROM sides WHERE own != other GROUP BY own),
cont AS (
  SELECT own AS split, CAST(count(*) AS BIGINT) AS contaminated_docs
  FROM (SELECT DISTINCT doc, own FROM sides WHERE own != other)
  GROUP BY own
)
SELECT n.split, n.n_docs,
       COALESCE(w.pairs_within, 0) AS pairs_within,
       COALESCE(c.pairs_cross, 0) AS pairs_cross,
       COALESCE(ct.contaminated_docs, 0) AS contaminated_docs
FROM n_docs n
LEFT JOIN within w ON n.split = w.split
LEFT JOIN crossed c ON n.split = c.split
LEFT JOIN cont ct ON n.split = ct.split
ORDER BY n.split
"""


CURATION_QUERIES["corpus_split_leakage"] = (
    split_leakage_query,
    _split_leakage_sql(),
)


# --------------------------------------------------------------------------
# Deterministic weighted per-source reservoir (skew-proof two-phase top-k)
# --------------------------------------------------------------------------

RESERVOIR_K = 25  #: docs kept per source
RESERVOIR_SALTS = 64  #: phase-1 fan-out per source


def reservoir_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted k-sample per source — the reservoir-sampling
    step of corpus assembly (pick k representative docs per source,
    longer docs more likely), derandomized for oracle-exactness.

    Priority = ``md5_60(text) // max(n_chars, 1)``: the hash plays the
    uniform draw of Efraimidis–Spirtas A-Res weighted reservoir sampling
    and the integer division by the length weight replaces the textbook
    ``u^(1/w)`` key — monotone in the same direction, but PURE INTEGER
    arithmetic, so both engines rank identically (a float ``pow``/``ln``
    key could flip the k-th/k+1-th boundary on a last-ulp difference).

    Skew-proof plan (per-group top-k at scale): top-k is mergeable, so
    phase 1 ranks within (source, salt=doc_id mod 64) — 64-way spread of
    even a single-source 100 TB corpus — and keeps ≤k per salt; phase 2
    ranks the ≤64·k survivors per source.  Exactly equal to the naive
    single window by source (the oracle's form), but no reducer ever
    sees more than 1/64th of a hot source + 64·k rows."""
    docs = load_table(spark, sf_dir, "documents")
    pr = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) "
            "div greatest(n_chars, 1)"
        ).alias("priority"),
    ).withColumn("__salt", F.pmod(F.col("doc_id"), F.lit(RESERVOIR_SALTS)))
    w1 = Window.partitionBy("source", "__salt").orderBy("priority", "doc_id")
    stage1 = (
        pr.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= RESERVOIR_K)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        stage1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= RESERVOIR_K)
        .orderBy("source", "rank")
    )


RESERVOIR_SQL = f"""
WITH pr AS (
  SELECT source, doc_id, n_chars,
         ('0x' || substring(md5(text), 1, 15))::BIGINT
           // GREATEST(n_chars, 1) AS priority
  FROM documents
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY priority, doc_id) AS rank
  FROM pr
)
SELECT source, doc_id, n_chars, priority, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {RESERVOIR_K}
ORDER BY source, rank
"""


CURATION_QUERIES["corpus_reservoir_topk"] = (
    reservoir_topk_query,
    RESERVOIR_SQL,
)


# --------------------------------------------------------------------------
# Overlapping token-window chunking (retrieval / embedding prep)
# --------------------------------------------------------------------------

CHUNK_SIZE = 64  #: tokens per chunk
CHUNK_STRIDE = 32  #: tokens between chunk starts (50% overlap)


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split every document into overlapping token windows — the
    chunking pass in front of an embedding/retrieval index (fixed-size
    windows, 50% overlap by default so no boundary sentence is lost).

    Output: one row per chunk with (doc, chunk_id, start, n_tokens,
    chunk_hash) where ``chunk_hash`` is the md5 of the space-joined
    window — the compact value-checkable identity of the chunk text
    (emitting the text itself would only bloat the checked payload).

    Scale: map-only (tokenize → window transform → posexplode); no
    shuffle at all, so throughput is scan-bound — the correct shape for
    a 100 TB chunking pass.  A document shorter than ``size`` yields one
    (shorter) chunk; chunk starts are 0, stride, 2·stride, … up to the
    last start < n_tokens (the final window may be partial)."""
    from ..functions.text import tokens

    tk = tokens(F.col(text_col))
    starts = F.expr(
        f"sequence(0, greatest(size(__tk) - 1, 0), {int(stride)})"
    )
    return (
        df.select(F.col(id_col), tk.alias("__tk"))
        .filter(F.size("__tk") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    starts,
                    lambda s: F.md5(
                        F.array_join(F.slice(F.col("__tk"), s + 1, size), " ")
                    ),
                )
            ).alias("chunk_id", "chunk_hash"),
            F.size("__tk").alias("__n"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("start"),
            F.least(
                F.lit(size),
                F.col("__n") - F.col("chunk_id") * stride
            ).cast("long").alias("n_tokens"),
            "chunk_hash",
        )
    )


def chunk_windows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_windows(docs)
        .orderBy("doc_id", "chunk_id")
    )


def _chunk_windows_sql() -> str:
    from ..functions.text import TOKENS_SQL

    t = TOKENS_SQL.format(col="text")
    return f"""
WITH toks AS (
  SELECT doc_id, {t} AS tk FROM documents
),
starts AS (
  SELECT doc_id, tk, len(tk) AS n,
         unnest(range(0, greatest(len(tk), 1), {CHUNK_STRIDE})) AS s
  FROM toks WHERE len(tk) > 0
)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS start,
       CAST(LEAST({CHUNK_SIZE}, n - s) AS BIGINT) AS n_tokens,
       md5(array_to_string(tk[s + 1 : s + {CHUNK_SIZE}], ' ')) AS chunk_hash
FROM starts
ORDER BY doc_id, chunk_id
"""


CURATION_QUERIES["corpus_chunk_windows"] = (
    chunk_windows_query,
    _chunk_windows_sql(),
)


# --------------------------------------------------------------------------
# Snapshot diff (dataset versioning: what changed between crawl N and N+1)
# --------------------------------------------------------------------------


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Diff two corpus snapshots: per (source, status) counts where
    status ∈ added / removed / modified / unchanged, plus the net
    character delta — the dataset-versioning ledger a training pipeline
    keeps between crawl iterations (what must re-embed, what leaves the
    index, how the corpus is drifting).

    Content identity is md5(text) — compared, never materialized into
    the shuffle wider than 32 chars/side.  Plan: ONE full outer join on
    the id (co-partitioned; zero-exchange when both snapshots are stored
    bucketed by id — the same storage contract as apply_changelog), then
    a map-side-combined count by (source, status)."""
    a = v1.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("src_a"),
        F.md5(F.col(text_col)).alias("h_a"),
        F.length(F.col(text_col)).cast("long").alias("len_a"),
    )
    b = v2.select(
        F.col(id_col).alias("id_b"),
        F.col(group_col).alias("src_b"),
        F.md5(F.col(text_col)).alias("h_b"),
        F.length(F.col(text_col)).cast("long").alias("len_b"),
    )
    j = a.join(b, F.col("id") == F.col("id_b"), "full_outer")
    status = (
        F.when(F.col("h_a").isNull(), "added")
        .when(F.col("h_b").isNull(), "removed")
        .when(F.col("h_a") != F.col("h_b"), "modified")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("src_b"), F.col("src_a")).alias("source"),
            status.alias("status"),
            (
                F.coalesce(F.col("len_b"), F.lit(0))
                - F.coalesce(F.col("len_a"), F.lit(0))
            ).alias("char_delta"),
        )
        .groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("char_delta").cast("long").alias("chars_delta"),
        )
        .orderBy("source", "status")
    )


def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: two snapshots derived deterministically from the
    documents table (the changelog-fixture pattern — mutation classes
    keyed off doc_id, replayed arithmetically by the oracle): v2 ADDS
    the docs with ``doc_id % 7 = 3`` (absent from v1), REMOVES
    ``doc_id % 11 = 4``, and MODIFIES ``doc_id % 5 = 0`` (a marker
    suffix); everything else is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.expr("doc_id % 7 != 3"))
    v2 = docs.filter(F.expr("doc_id % 11 != 4")).withColumn(
        "text",
        F.when(
            F.expr("doc_id % 5 = 0"), F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(v1, v2)


SNAPSHOT_DIFF_SQL = """
WITH v1 AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 != 3
),
v2 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
  FROM documents WHERE doc_id % 11 != 4
),
j AS (
  SELECT COALESCE(b.source, a.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN md5(a.text) != md5(b.text) THEN 'modified'
              ELSE 'unchanged' END AS status,
         COALESCE(length(b.text), 0) - COALESCE(length(a.text), 0)
           AS char_delta
  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT source, status,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(char_delta) AS BIGINT) AS chars_delta
FROM j GROUP BY source, status
ORDER BY source, status
"""


CURATION_QUERIES["corpus_snapshot_diff"] = (
    snapshot_diff_query,
    SNAPSHOT_DIFF_SQL,
)
