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


def compact_files(spark, src_path: str, dst_path: str,
                  target_rows_per_file: int = 1_000_000,
                  sort_cols: list[str] | None = None) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows / target) right-sized files, optionally re-sorting so footer
    stats stay selective.

    Why this matters at 100 TB: streaming/incremental writers leave
    thousands of KB-sized files per partition; every downstream scan then
    pays a task + open + footer-parse per file, and the driver pays
    listing + planning per file. Compaction is the standing maintenance
    job (Delta OPTIMIZE / Iceberg rewrite_data_files). Uses coalesce (no
    shuffle) when only merging, repartitionByRange when re-sorting.

    Returns {"files_before", "files_after", "rows"} for audit.
    """
    import glob as _glob

    df = spark.read.parquet(src_path)
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    files_before = len(_glob.glob(f"{src_path}/*.parquet"))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    files_after = len(_glob.glob(f"{dst_path}/*.parquet"))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   bits: int = 10, n_files: int = 8,
                   mode: str = "overwrite") -> None:
    """Z-order-clustered parquet layout: Morton-interleave the low ``bits``
    of TWO cluster columns into one sort key, then range-partition + sort
    on it (the multi-dimensional generalisation of :func:`write_clustered`,
    what Delta/Iceberg ``OPTIMIZE ZORDER BY`` does).

    Why this matters at 100 TB: single-key range clustering gives tight
    footer min/max stats on ONE column only — predicates on the second
    column still scan every file. Interleaving bits makes each file a
    small rectangle in (x, y) space, so min/max file skipping stays
    selective for EITHER predicate. Footer-stats selectivity on both
    dimensions is asserted in tests/test_pipeline_ops.py.

    Both columns must be non-negative integers (hash/bucketize first
    otherwise); only their low ``bits`` influence placement.
    """
    from pyspark.sql import functions as F

    from ..operators.bucketing import morton_col

    mask = (1 << bits) - 1
    z = morton_col(
        F.col(x_col).cast("bigint").bitwiseAND(F.lit(mask)),
        F.col(y_col).cast("bigint").bitwiseAND(F.lit(mask)),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = "gzip") -> None:
    """JSON-lines sink (one object per row, optionally gzipped) — the
    interchange format most external training-data tooling consumes.
    Splittable only when uncompressed; gzip shards must stay small enough
    that one file ≈ one task (the writer inherits the upstream partition
    count, so repartition to the shard budget first)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by=None) -> None:
    """ORC sink (built-in, zlib, footer statistics) — the columnar
    interchange with Hive/Trino stacks; same pushdown/pruning behavior as
    the parquet path."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
