"""Vector (array<double>) column expressions.

The reference's linear algebra is per-feature scalar arithmetic over dense
driver arrays (``MatrixRow.java``, ``SVDMovieLensSparkJava.java:499-513``).
Here a factor/embedding is an ``array<double>`` column and everything is a
higher-order Catalyst expression (``zip_with`` / ``aggregate`` /
``transform``) — JVM-side, no Python, distributable to any row count.

Fold order matters for two of these:
- :func:`dot` folds left-to-right, matching DuckDB's ``list_reduce`` so
  oracle sums are bit-identical;
- :func:`clamped_fold` reproduces the reference's ORDER-DEPENDENT
  per-feature clamp (clamp applied after adding each feature's product,
  ``SVDMovieLensSparkJava.java:503-511``) — a plain dot product + final
  clamp is NOT equivalent (SURVEY.md §4 trap (a)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalar import MAX_RATING, MIN_RATING, clamp


def to_double(arr: Column) -> Column:
    """array<float> → array<double> (fixtures store float32 embeddings)."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def clamped_fold(user_vec: Column, item_vec: Column,
                 init: float = 1.0, lo: float = MIN_RATING, hi: float = MAX_RATING) -> Column:
    """The reference's full-model predictor U2
    (``SVDMovieLensSparkJava.java:499-513``)::

        sum = 1.0
        for f in range(rank):
            sum = clamp(sum + item_vec[f] * user_vec[f], 1, 5)

    Exact-parity semantics: the clamp inside the fold makes the result
    depend on feature order, so this is an ``aggregate`` fold, not ``dot``.
    """
    products = F.zip_with(user_vec, item_vec, lambda x, y: x * y)
    return F.aggregate(products, F.lit(float(init)), lambda acc, v: clamp(acc + v, lo, hi))
