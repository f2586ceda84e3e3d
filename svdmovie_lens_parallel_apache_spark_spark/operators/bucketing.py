"""Bucketing: shuffle-free co-located joins.

Not in the reference (its 'co-location' was dense driver arrays indexed by
ID — ``SVDMovieLensSparkJava.java:219-221``). At 100 TB, the fact⋈fact
join that can't broadcast is the expensive one; pre-bucketing both tables
on the join key by the same bucket count removes the per-query shuffle
entirely — Spark's bucketed-scan join reads co-located buckets and skips
the Exchange (asserted in tests/test_bucketing.py via plan_summary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_col(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` of x and y into a Morton (Z-order)
    code — pure bitwise Catalyst expressions, bigint in, bigint out.
    The multi-dimensional layout key behind ``writers.write_zordered``
    and ``snapshot_table.compact_table(zorder_by=...)``; DuckDB twin:
    ``catalog_pipeline._morton_sql``."""
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return z


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 16, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (+ optionally sorted) managed table. Sorting
    within buckets additionally removes the sort from sort-merge joins."""
    spark = df.sparkSession
    if mode == "overwrite":
        # A fresh (in-memory) metastore forgets tables but their warehouse
        # directories survive; saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS. Drop both.
        import shutil
        from urllib.parse import urlparse

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two pre-bucketed tables — with matching bucket specs, the plan
    has no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
