"""Text-analysis column expressions (documents table surface).

The reference has no text ops (its only string work is TSV splitting,
``SVDMovieLensSparkJava.java:195``); these are the north-star
training-data-pipeline additions (BASELINE.json), built as pure Catalyst
expressions so they vectorise inside whole-stage codegen. Each has an exact
DuckDB-SQL twin used by the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny function-word lists for the n-gram/stopword language heuristic.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed (trailing separators).

    After ``trim``, splitting on ``\\s+`` can only produce an empty token
    for the empty string itself, so a single ``when`` guard replaces a
    ``F.filter`` HOF — higher-order functions are interpreted per element
    (no codegen), and this sits under every shingle/token-count query
    (measured ~1.5× on the sf0.1 shingle pipeline)."""
    tr = F.trim(text)
    return F.when(tr == "", F.array().cast("array<string>")).otherwise(
        F.split(tr, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from an ALREADY-BOUND token array column.

    ``toks`` must be a plain column reference (bind it with a prior
    ``select(...alias())``), not an inline tokenization expression: the
    index lambda references it once per shingle position, and Catalyst
    does NOT common-subexpression-eliminate across higher-order-function
    lambdas — an inline `tokens(text)` here is re-split per position
    (O(doc_len × positions); measured 5.3s → 0.3s at sf0.1 for binding).
    """
    return F.array_distinct(positional_shingles(toks, n))


def positional_shingles(toks: Column, n: int = 3) -> Column:
    """ORDERED n-word shingles (one per position, duplicates kept) — the
    positional form rolling-hash fingerprinting needs; same binding caveat
    as :func:`shingles_from_tokens`."""
    count = F.size(toks) - F.lit(n - 1)
    # NB Spark's sequence(1, 0) yields a DESCENDING [1, 0], not [] — guard short docs.
    idx = F.when(count < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), count)
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Single-expression form of :func:`shingles_from_tokens` (convenient
    for tests/small data; prefer the bound-column form in operators)."""
    return shingles_from_tokens(tokens(text), n)


def punct_ratio(text: Column) -> Column:
    """(# non-alphanumeric-non-space chars) / length."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(text)
    )


def stopword_ratio(text: Column, stopwords=STOPWORDS_EN) -> Column:
    """Fraction of tokens that are English function words — the quality /
    language-ID signal used by C4/Gopher-style filters."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )
