"""Per-key and global statistics operators.

Reference mapping (SURVEY.md §2): the reference computes per-customer and
per-movie (count, sum) with TWO ``reduceByKey`` passes plus a join
(A1-A4 + J1-J2, ``SVDMovieLensSparkJava.java:196-212``) — three shuffles
per entity. :func:`keyed_stats` is the idiomatic replacement: ONE
``groupBy().agg()`` = one shuffle with map-side partial aggregation
(``HashAggregateExec`` partial→final), which is exactly what
``reduceByKey`` did, minus the extra shuffle and the join.

``error_metrics`` covers A5/A6/A7 + M2: global count, MAE
(``Avg Abs(diff)``, line 470), RMSE (``sqrt(sq/n)``, line 393).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import abs_err, pseudo_avg


def keyed_stats(df: DataFrame, key: str | list[str], value: str | Column,
                pseudo: bool = True) -> DataFrame:
    """count / sum / avg (+ Bayesian pseudo-avg) per key, one shuffle.

    Replaces ``Customer``/``Movie`` stats builds (``Customer.java:5-15``,
    ``Movie.java:5-41``). At 100 TB this is a single hash aggregation whose
    partial side runs map-local; no join, no second pass.
    """
    keys = [key] if isinstance(key, str) else list(key)
    val = F.col(value) if isinstance(value, str) else value
    aggs = [
        F.count(F.lit(1)).alias("rating_count"),
        F.sum(val).alias("rating_sum"),
        F.avg(val).alias("rating_avg"),
    ]
    out = df.groupBy(*keys).agg(*aggs)
    if pseudo:
        out = out.withColumn(
            "pseudo_avg", pseudo_avg(F.col("rating_sum"), F.col("rating_count"))
        )
    return out


def error_metrics(df: DataFrame, actual: str, predicted: str) -> DataFrame:
    """n / MAE / RMSE in a single global aggregation (one pass).

    The reference triple-evaluated its test lineage for count, MAE and the
    output dump (lines 465-469, no ``cache()``); here one job computes all
    metrics.
    """
    err = abs_err(F.col(actual), F.col(predicted))
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(err).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
    )
