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
