"""Portable frequency/membership sketches: count-min and a relational
Bloom-filter join prune.

The reference has no sketches (its aggregation surface is exact
reduceByKey sums, SVDMovieLensSparkJava.java:118-131); these are the
100 TB additions: a count-min sketch whose memory is O(d·w) REGARDLESS of
key cardinality, and a Bloom-style membership prune that cuts a fact-table
shuffle down to near-matching rows before the exact join.

Both are built on the portable md5 hash family (functions/hashing.py), so
a DuckDB oracle replays the exact same cells/buckets — the sketches are
deterministic, not sampled, and the driver hash-gates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _salted_bucket(j: Column, key: Column, width: int) -> Column:
    """Row-j CMS/Bloom bucket: H(j || key) mod width, portable."""
    return portable_hash64(
        F.concat(j.cast("string"), F.lit("|"), key.cast("string"))
    ) % width


def cms_build(df: DataFrame, key: str, depth: int = 4, width: int = 64) -> DataFrame:
    """Count-min sketch of ``key`` frequencies: ``depth`` independent hash
    rows × ``width`` buckets → (j, bucket, cell_n).

    Scale shape: ONE groupBy over (j, bucket) — depth·width cells total
    (256 at the defaults) no matter how many distinct keys flow through;
    partial aggregation means each task ships at most d·w partial cells.
    The exploded j column multiplies rows depth× map-side only; no
    additional shuffle vs a plain count.
    """
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    return (
        df.select(F.col(key), j)
        .select("j", _salted_bucket(F.col("j"), F.col(key), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, key: str,
    depth: int = 4, width: int = 64,
) -> DataFrame:
    """Point-estimate each candidate key from the sketch: min over the
    ``depth`` cells the key hashes to. Guaranteed ``est >= true count``
    (cells only ever over-count via collisions).

    The sketch is d·w rows — always broadcast; candidates never shuffle.
    """
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probes = candidates.select(F.col(key), j).select(
        key, "j", _salted_bucket(F.col("j"), F.col(key), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key)
        .agg(F.min("cell_n").alias("cms_est"))
    )


def bloom_positions(
    build: DataFrame, key: str, m: int = 2048, k: int = 3
) -> DataFrame:
    """The Bloom filter as a relation: the distinct (j, pos) bit positions
    set by the build side's keys — at most ``m·k`` rows, always broadcast.
    """
    j = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("j")
    return (
        build.select(F.col(key), j)
        .select("j", _salted_bucket(F.col("j"), F.col(key), m).alias("pos"))
        .distinct()
    )


def bloom_prune(
    probe: DataFrame, positions: DataFrame, key: str, m: int = 2048, k: int = 3
) -> DataFrame:
    """Keep probe rows whose key passes the Bloom membership test: all
    ``k`` hash positions present in ``positions``. No false negatives
    (every true match passes); false positives bounded by the classic
    (1 - e^{-kn/m})^k.

    Scale shape: the ≤ m·k set positions collapse into ONE row holding a
    sorted bit-index array; that single row broadcasts (crossJoin) and
    each probe row tests its k positions with ``array_contains`` —
    entirely map-side, the probe table never shuffles. This is the manual
    twin of Spark's runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.enabled), kept portable so
    the oracle can replay membership bit-for-bit.
    """
    # encode (j, pos) as j*m + pos; one sorted array in one row
    bits = positions.agg(
        F.sort_array(F.collect_set(F.col("j") * m + F.col("pos"))).alias("set_bits")
    )
    probed = probe.crossJoin(F.broadcast(bits))
    passes = None
    for j in range(k):
        hit = F.array_contains(
            F.col("set_bits"),
            F.lit(j) * m + _salted_bucket(F.lit(j), F.col(key), m),
        )
        passes = hit if passes is None else (passes & hit)
    return probed.where(passes).drop("set_bits")
