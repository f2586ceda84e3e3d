"""Sources: parquet fixture tables + MovieLens-shaped TSV.

Reference surface covered (SURVEY.md §2): S1/S2 text-file scans
(``sc.textFile`` + manual ``split("\\t")`` at ``SVDMovieLensSparkJava.java:
191,195,456-458``) become schema-explicit CSV reads — the parse, the
string→int casts (P2/P6) and the timestamp-column drop (line 197) all
happen inside the scan so Catalyst prunes and pushes down for free.

Scale notes: every reader takes an explicit schema (no ``inferSchema``
full-scan), and parquet reads rely on the vectorized reader + predicate
pushdown. At 100 TB the fixture loaders below become partitioned-table
scans; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Driver fixture tables (TESTDATA.md); one parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

MOVIELENS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("movie_id", T.IntegerType()),
        T.StructField("rating", T.IntegerType()),
        T.StructField("ts", T.LongType()),  # read then dropped, like reference line 197
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar scan, schema from parquet footer.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as nanos-since-epoch long
    (``spark.sql.legacy.parquet.nanosAsLong`` — a runtime SQL conf, so it
    works under a caller-owned session too) and rebuild a microsecond
    timestamp with exact integer division (double division would lose
    sub-microsecond precision at 1.7e18 ns magnitudes).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Read fixture tables and register each as a temp view (SQL surface)."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_tsv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Generic TSV scan with explicit schema (replaces S1/S2 + P1 tokenise)."""
    return spark.read.csv(path, sep="\t", schema=schema, header=False)


def read_movielens_ratings(spark: SparkSession, path: str) -> DataFrame:
    """MovieLens u.data-shaped TSV → (user_id, movie_id, rating).

    Mirrors the reference ingest: four TSV columns, timestamp discarded
    (``SVDMovieLensSparkJava.java:195-197,214``). The drop is a projection,
    so the CSV scan only materialises three columns.
    """
    return read_tsv(spark, path, MOVIELENS_SCHEMA).select("user_id", "movie_id", "rating")
