"""Text-analysis operators over a documents table.

North-star additions (BASELINE.json): the reference has no text surface
(SURVEY.md §2.1), but a training-data pipeline needs per-document quality
metrics, language-ID, fingerprints, and corpus term statistics. All pure
Catalyst expressions — at 100 TB these are embarrassingly parallel
scan-side transforms with one optional shuffle for corpus-level stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.scalar import portable_round as _r
from ..functions.text import punct_ratio, stopword_ratio, tokens


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality metrics (C4/Gopher-style filter signals):
    token counts, type-token ratio, mean token length, stopword and
    punctuation ratios."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    # total token chars = chars of trimmed text minus the (n_tok-1) separators
    tok_chars = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_tok.alias("n_tokens"),
        n_types.alias("n_types"),
        _r(n_types.cast("double") / n_tok, 6).alias("type_token_ratio"),
        _r(tok_chars.cast("double") / n_tok, 6).alias("mean_token_len"),
        _r(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        _r(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    )


def quality_score(docs: DataFrame,
                  min_tokens: int = 10, max_mean_len: float = 12.0) -> DataFrame:
    """Composite keep/drop quality gate over :func:`text_stats` signals."""
    s = text_stats(docs)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_token_len") <= max_mean_len)
        & (F.col("type_token_ratio") > 0.01)
    )
    return s.withColumn("keep", keep.cast("int"))


def lang_id_heuristic(docs: DataFrame, en_threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language heuristic: function-word density is the
    classic cheap n-gram language signal. Emits the signal and the
    predicted label next to the fixture's ground-truth ``lang``."""
    ratio = stopword_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        _r(ratio, 6).alias("en_signal"),
        F.when(ratio >= en_threshold, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonicalised content fingerprints: md5 hex + engine-portable 32-bit
    int (same canonicalisation the exact-dedup operator keys on)."""
    canon = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fp_md5"),
        portable_hash64(canon).alias("fp64"),
        F.length(F.col("text")).alias("n_chars_actual"),
    )


def term_frequency(docs: DataFrame, top_n: int = 25) -> DataFrame:
    """Corpus-level term frequency, top-N by (count desc, term asc).

    Scale shape: explode → hash-agg (map-side partials) → global top-N via
    ordered limit; the agg shuffle carries one row per distinct term, not
    per token occurrence.
    """
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .orderBy(F.desc("term_count"), F.asc("term"))
        .limit(top_n)
    )


def winnowing_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS local fingerprinting scheme), as pure column expressions:

        tokens → POSITIONAL k-gram hashes h_i (rolling content hash)
        → every window of w consecutive hashes → min per window
        → distinct selected minima = the doc's fingerprint set

    Guarantee: two docs sharing any token run of ≥ w+k-1 tokens share at
    least one fingerprint, while only ~2/(w+1) of k-gram hashes are kept —
    the sub-linear sketch for plagiarism/near-dup detection over 100 TB
    (fingerprints equi-join instead of text comparison). Docs shorter than
    one full window keep min(hs) so every non-trivial doc has ≥1
    fingerprint. Output is exploded to (doc_id, fp) rows — joinable, no
    array columns."""
    from ..functions.hashing import portable_hash64 as _h
    from ..functions.text import positional_shingles
    from ..functions.text import tokens as _tokens

    bound = docs.select("doc_id", _tokens(F.lower(F.col("text"))).alias("__toks"))
    hashed = bound.select(
        "doc_id",
        F.transform(
            positional_shingles(F.col("__toks"), k), lambda s: _h(s)
        ).alias("hs"),
    )
    cnt = F.size("hs") - F.lit(w - 1)
    idx = F.when(cnt < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), cnt)
    )
    wins = F.transform(idx, lambda i: F.array_min(F.slice(F.col("hs"), i, w)))
    fps = (
        F.when(F.size("hs") == 0, F.array().cast("array<bigint>"))
        .when(F.size("hs") < w, F.array(F.array_min("hs")))
        .otherwise(F.array_distinct(wins))
    )
    return hashed.select("doc_id", F.explode(fps).alias("fp"))
