"""Sinks.

Reference S3 is a text dump of prediction rows
(``testingDataRDD.saveAsTextFile`` at ``SVDMovieLensSparkJava.java:469``,
row format ``TestingData.java:33-36``). Here: TSV for byte-compatible
output, parquet as the scale-path sink (columnar, splittable,
statistics for pushdown on re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TSV sink matching the reference's prediction dump shape."""
    df.write.mode(mode).csv(path, sep="\t", header=False)


def write_clustered(df: DataFrame, path: str, cluster_cols: list[str],
                    n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the
    cluster key(s) + ``sortWithinPartitions`` before the write, so each
    output file covers a NARROW, near-disjoint key range.

    Why this matters at 100 TB: parquet footers carry per-column min/max;
    a range-clustered layout makes those statistics selective, so key-
    predicate scans prune whole files/row-groups instead of reading
    everything (the single-key version of Z-ordering). The range
    partitioner samples key quantiles, so skewed keys still split evenly.
    Layout selectivity is asserted in tests/test_scale_ops.py via the
    written footer statistics.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
