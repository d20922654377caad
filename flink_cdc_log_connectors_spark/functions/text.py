"""Shared text primitives used by the text-analysis and dedup operators.

Tokenization is defined ONCE here, with an exactly-equivalent DuckDB SQL
fragment, so Spark plans and oracle queries can never drift: lowercase,
split on runs of non-alphanumeric characters, drop empty tokens.  The
regex is intentionally restricted to a character class valid in both Java
regex (Spark) and RE2-ish (DuckDB) dialects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: DuckDB fragment producing the same token array for a column expression
TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x != '')"
)

#: tiny English stopword list shared with oracles (quality scoring)
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")


def tokens(col: str | Column) -> Column:
    """Lower-cased word tokens of a string column (empty tokens dropped).

    ``array_remove`` instead of a ``filter`` lambda: higher-order-function
    lambdas are interpreted per element (not codegen'd) — on a 100 TB corpus
    that difference is the whole budget."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_SPLIT_RE), "")


def word_count_in_set(col: str | Column, words: tuple[str, ...]) -> Column:
    """Occurrence count of any of ``words`` as whole tokens — a single
    codegen'd regexp pass (no per-token lambda).  ``\\b`` boundaries agree
    with the ``[^a-z0-9]+`` tokenizer except for ``_`` (a regex word char
    the tokenizer splits on); callers' corpora must not rely on that edge.
    """
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat)).cast("int")


def word_count_in_set_sql(col: str, words: tuple[str, ...]) -> str:
    """DuckDB twin of :func:`word_count_in_set`."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"CAST(len(regexp_extract_all(lower({col}), '{pat}')) AS INT)"


def word_ngrams(tokens_col: Column, n: int) -> Column:
    """Distinct word n-gram shingles from a token array.

    Guarded for short docs: Spark's ``sequence(a, b)`` DESCENDS when b < a,
    so the empty case must be explicit.
    """
    size = F.size(tokens_col)
    idx = F.sequence(F.lit(0), size - F.lit(n))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(tokens_col, i + F.lit(j)) for j in range(n)]
    )
    return F.when(
        size >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def md5_60(s: str) -> int:
    """Portable 60-bit string hash: first 15 hex chars of md5 as an int.

    Bit-identical across Python (``int(md5(s).hexdigest()[:15], 16)``),
    Spark SQL (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
    (``('0x' || substring(md5(s),1,15))::BIGINT``) — the shared hash that
    lets minhash/simhash pipelines be oracle-exact end to end.  Always
    positive, fits a signed 64-bit long with 3 bits to spare (headroom
    for overflow-free arithmetic on top).
    """
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


#: DuckDB twin of :func:`md5_60` for an expression ``e``
MD5_60_SQL = "('0x' || substring(md5({e}), 1, 15))::BIGINT"


def _hashed_ngram_udf(col: str | Column, n: int, positional: bool) -> Column:
    """Shared Arrow-batched tokenize→shingle→md5-60 pass behind both gram
    shapes (ONE tokenizer/hash definition — the set and positional
    variants can never drift)."""
    import hashlib
    import re

    import pandas as pd

    tok_re = re.compile(TOKEN_SPLIT_RE)

    def _f(texts):
        out = []
        for t in texts:
            toks = [w for w in tok_re.split((t or "").lower()) if w]
            if len(toks) < n:
                out.append([])
                continue
            grams = (
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            if not positional:
                grams = dict.fromkeys(grams)  # distinct, first-seen order
            out.append(
                [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
            )
        return pd.Series(out)

    _f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    from .prepared import prepared

    # the UDF wrapper (registration + schema round-trips) is memoized;
    # the function body is a pure closure over (n, positional) (r13)
    udf = prepared(
        ("hashed_ngram_udf", n, positional),
        lambda: F.pandas_udf(_f, "array<long>"),
    )
    c = F.col(col) if isinstance(col, str) else col
    return udf(c)


def hashed_word_ngrams(col: str | Column, n: int) -> Column:
    """Distinct word n-grams of a text column as 60-bit md5 hashes.

    Arrow-batched Pandas UDF: tokenize + shingle + hash in one vectorized
    Python pass.  Measured 10× faster than the pure-Catalyst
    ``transform(sequence(...), i -> concat_ws(...))`` formulation, whose
    higher-order-function lambdas are interpreted per element (sf0.1
    documents: 1.2s vs 12.6s for shingle generation).  Hash =
    :func:`md5_60` — portable to DuckDB, so oracles can reproduce not
    just hash *equality* (all Jaccard needs) but the hash *values*
    (what minhash signatures need).
    """
    return _hashed_ngram_udf(col, n, positional=False)


def positional_hashed_word_ngrams(col: str | Column, n: int) -> Column:
    """Word n-grams of a text column IN POSITION ORDER (duplicates kept) as
    60-bit md5 hashes — the positional twin of :func:`hashed_word_ngrams`
    for span-level analyses where each gram START POSITION matters.
    Same shared pass (``_hashed_ngram_udf``) minus the distinct step."""
    return _hashed_ngram_udf(col, n, positional=True)


def grouped_positional_ngram_rows(n: int, id_col: str, text_col: str):
    """mapInPandas stage: per document, ONE ROW PER DISTINCT GRAM with its
    sorted position list — ``(id, h, poss array<int>)``.

    The doc-local pre-aggregation behind span-level dedup (VERDICT r3 #5):
    the inverted-index shuffle then carries one row per distinct
    (doc, gram) with positions PACKED in an array cell instead of one row
    per position, and per-doc totals reduce map-side from ``size(poss)``.

    Tokenizer: the shared ``TOKEN_SPLIT_RE`` definition.  Hash: unlike the
    md5-60 gram hashes (whose VALUES oracles must reproduce — minhash
    signatures), span coverage only needs gram EQUALITY (oracles join the
    raw gram text), so this pass uses a vectorized 64-bit rolling hash —
    ``pd.util.hash_array`` token hashes (fixed-key siphash, deterministic
    across executors) combined positionally by odd-constant powers, all
    numpy — instead of one Python ``hashlib.md5`` call per gram.  Measured
    ~3× on the sf0.1 gram pass; collision odds at 64 bits are ~1e-11 for
    a 10⁸-gram corpus and only ever MERGE two gram families (a vanishing
    under-count of dup coverage, never a crash).

    Output schema: ``{id_col} long, h long, poss array<int>``.
    """
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(TOKEN_SPLIT_RE)
    P = np.uint64(0x9E3779B97F4A7C15)  # odd ⇒ bijective per-position mix

    def op(batches):
        err = np.seterr(over="ignore")  # uint64 wrap is the hash design
        try:
            for pdf in batches:
                ids, hs, poss = [], [], []
                for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                    toks = [w for w in tok_re.split((t or "").lower()) if w]
                    L = len(toks)
                    if L < n:
                        continue
                    th = pd.util.hash_array(np.asarray(toks, dtype=object))
                    m = L - n + 1
                    g = np.zeros(m, dtype=np.uint64)
                    mult = np.uint64(1)
                    for j in range(n):
                        g += th[j : m + j] * mult
                        mult = mult * P
                    order = np.argsort(g, kind="stable")
                    gs = g[order].view(np.int64)
                    starts = np.nonzero(np.r_[True, gs[1:] != gs[:-1]])[0]
                    for k, s in enumerate(starts):
                        e = starts[k + 1] if k + 1 < len(starts) else m
                        ids.append(doc_id)
                        hs.append(int(gs[s]))
                        # stable argsort keeps positions ascending per gram
                        poss.append(order[s:e].tolist())
                # explicit dtypes: an empty batch otherwise defaults to
                # float64 ndarrays, which Arrow cannot cast to list<int>
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids, dtype="int64"),
                        "h": pd.Series(hs, dtype="int64"),
                        "poss": pd.Series(poss, dtype="object"),
                    }
                )
        finally:
            np.seterr(**err)

    return op, f"{id_col} long, h long, poss array<int>"


def positional_ngrams_sql(col: str, n: int) -> str:
    """DuckDB fragment: word n-grams of ``col`` in position order (list,
    1-based positions, duplicates kept) — twin of
    :func:`positional_hashed_word_ngrams` minus the hashing (oracles join
    on the raw gram text; the Spark side joins the md5-60 hashes of the
    same grams)."""
    toks = TOKENS_SQL.format(col=col)
    parts = "||' '||".join(f"t[i+{j}]" for j in range(n))
    return (
        f"(SELECT list_transform("
        f"generate_series(1, greatest(len(t)-{n - 1}, 0)), i -> {parts}) "
        f"FROM (SELECT {toks} AS t) __tk)"
    )


def ngrams_sql(col: str, n: int) -> str:
    """DuckDB fragment: distinct word n-grams of ``col`` (1-based indexing)."""
    toks = TOKENS_SQL.format(col=col)
    parts = "||' '||".join(f"t[i+{j}]" for j in range(n))
    return (
        f"(SELECT list_distinct(list_transform("
        f"generate_series(1, greatest(len(t)-{n - 1}, 0)), i -> {parts})) "
        f"FROM (SELECT {toks} AS t) __tk)"
    )


#: BPE-ish pre-tokenization regex (GPT-2-style): contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs.  Restricted to
#: constructs with identical semantics in Java regex (Spark) and RE2-ish
#: (DuckDB) so both engines produce the same token stream.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def bpe_ish_tokens(col: str | Column) -> Column:
    """BPE-style pre-tokens of a string column — the token stream whose
    count approximates an LLM tokenizer's (bytes-per-token is the corpus
    quality metric LLM data pipelines track)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)


def bpe_ish_tokens_sql(col: str) -> str:
    """DuckDB twin of :func:`bpe_ish_tokens` (the pattern's leading
    apostrophe must be doubled inside the SQL string literal)."""
    return f"regexp_extract_all({col}, '{BPE_ISH_RE.replace(chr(39), chr(39) * 2)}')"
