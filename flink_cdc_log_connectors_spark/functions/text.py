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
    """Lower-cased word tokens of a string column (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


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


def ngrams_sql(col: str, n: int) -> str:
    """DuckDB fragment: distinct word n-grams of ``col`` (1-based indexing)."""
    toks = TOKENS_SQL.format(col=col)
    parts = "||' '||".join(f"t[i+{j}]" for j in range(n))
    return (
        f"(SELECT list_distinct(list_transform("
        f"generate_series(1, greatest(len(t)-{n - 1}, 0)), i -> {parts})) "
        f"FROM (SELECT {toks} AS t) __tk)"
    )
