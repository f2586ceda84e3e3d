"""Portable deterministic hashing.

Engine-portable 32-bit hash built from md5 so the DuckDB oracle can compute
bit-identical values:

- Spark:  ``CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)``
- DuckDB: ``CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)``

Spark's native ``F.hash``/``F.xxhash64`` (Murmur3/xxHash) are faster and are
what you'd use when no cross-engine parity is needed; these md5-derived
hashes exist so every dedup/minhash pipeline has an exact SQL oracle.
Both run JVM-side (md5 is a Catalyst expression), so the pipeline stays in
whole-stage codegen — just with a higher per-row constant than Murmur3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_SPACE = 2**32


def portable_hash64(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def portable_hash_wide(col: Column, bits: int = 48) -> Column:
    """First ``bits`` bits of md5 (bits % 4 == 0, ≤ 60) as a non-negative
    BIGINT in [0, 2^bits).

    The 32-bit :func:`portable_hash64` caps SimHash-style signatures at 32
    meaningful bits; wider signatures (48-bit default) keep pigeonhole
    chunk buckets fine-grained at corpus scale — 4 chunks of 12 bits give
    4096 bucket values per chunk vs 256 at 32 bits, an ~16× cut in
    candidate-bucket occupancy for the same Hamming radius."""
    assert bits % 4 == 0 and bits <= 60
    return F.conv(F.substring(F.md5(col.cast("string")), 1, bits // 4), 16, 10).cast(
        "bigint"
    )


def oracle_hash_wide_sql(expr: str, bits: int = 48) -> str:
    """DuckDB twin of :func:`portable_hash_wide`."""
    assert bits % 4 == 0 and bits <= 60
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, {bits // 4})) "
        "AS BIGINT)"
    )


def shingle_hash(col: Column, salt: int) -> Column:
    """Salted portable hash — the `i`-th minhash permutation is
    ``min over shingles of H(i || shingle)``."""
    return portable_hash64(F.concat(F.lit(f"{salt}|"), col.cast("string")))


def hash_unit(col: Column, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform double in [0, 1) from a key column.

    Used for portable synthetic data (golden factor matrices, sampling)
    that a DuckDB oracle can regenerate exactly.
    """
    h = shingle_hash(col, salt) if salt else portable_hash64(col.cast("string"))
    return h.cast("double") / F.lit(float(HASH_SPACE))


def oracle_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash64` over SQL expression text."""
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def oracle_shingle_hash_sql(expr: str, salt: int) -> str:
    return oracle_hash_sql(f"concat('{salt}|', CAST({expr} AS VARCHAR))")


def oracle_hash_unit_sql(expr: str, salt: int = 0) -> str:
    inner = oracle_shingle_hash_sql(expr, salt) if salt else oracle_hash_sql(expr)
    return f"(CAST({inner} AS DOUBLE) / {float(HASH_SPACE)})"
