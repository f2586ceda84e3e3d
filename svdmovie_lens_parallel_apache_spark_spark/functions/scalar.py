"""Scalar column expressions re-expressing the reference's scalar UDFs.

All JVM-side Catalyst expressions — zero Python UDFs — so they stay inside
whole-stage codegen (reference used Java lambdas / inner classes; SURVEY.md
§2 U1/U4/U5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference constants (SVDMovieLensSparkJava.java:42-44,126-128; Movie.java:38-41)
MIN_RATING = 1.0
MAX_RATING = 5.0
GLOBAL_AVG = 3.23
PSEUDO_COUNT = 25.0


def portable_round(col: Column, n: int) -> Column:
    """Engine-portable rounding: ``floor(x * 10^n + 0.5) / 10^n``.

    ``F.round`` (BigDecimal HALF_UP on the exact binary value) and DuckDB's
    ``round`` (scaled ``std::round``) disagree on exact ``.xxx5``
    boundaries, which decimal-priced data hits constantly. This formula is
    plain IEEE multiply/add/floor/divide, so Spark and the DuckDB oracle
    produce bit-identical doubles. Oracle twin:
    ``floor((expr) * 1eN + 0.5) / 1eN``.
    """
    m = F.lit(float(10**n))
    return F.floor(col * m + F.lit(0.5)) / m


def clamp(col: Column, lo: float = MIN_RATING, hi: float = MAX_RATING) -> Column:
    """Clamp to [lo, hi] — reference U1/U2 rating clamp
    (``SVDMovieLensSparkJava.java:230-235,479-484,503-511``)."""
    return F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), col))


def abs_err(actual: Column, predicted: Column) -> Column:
    """``TestingData.diff()`` (``TestingData.java:29-31``)."""
    return F.abs(actual - predicted)


def pseudo_avg(rating_sum: Column, rating_count: Column,
               global_avg: float = GLOBAL_AVG, k: float = PSEUDO_COUNT) -> Column:
    """Bayesian-smoothed mean, ``Movie.PseudoAvg()`` (``Movie.java:38-41``):
    ``(global_avg*k + sum) / (k + count)``."""
    return (F.lit(global_avg) * F.lit(k) + rating_sum) / (F.lit(k) + rating_count)
