"""Relational operators beyond what the reference shipped.

The reference's join surface is two inner equi-joins (J1/J2) and a manual
broadcast-lookup pattern (J3/J4) — SURVEY.md §2.1. The engine exposes the
full join family as thin, scale-conscious wrappers: Catalyst picks
broadcast-hash vs sort-merge (AQE converts at runtime), and callers can
force a broadcast for known-small dimensions.

Top-k-per-group is the standard window + filter: at scale the window sort
is per-partition-key only (no global sort), and for k=1
``max_by``-style aggregation would avoid the sort entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact ⋈ broadcast(dim) — the DataFrame form of the reference's
    broadcast-matrices-then-lookup pattern (J3,
    ``SVDMovieLensSparkJava.java:447-448,499-513``)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def topk_per_group(df: DataFrame, partition_by: list[str], order_by: list[Column],
                   k: int, rank_col: str = "rn") -> DataFrame:
    """Top-k rows per group via ``row_number`` over a per-group sort.

    ``order_by`` MUST end with a unique tiebreaker column for deterministic
    results (floating sort keys alone are not reproducible across engines).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
