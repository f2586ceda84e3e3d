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

import functools
import os

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


def _probe_ts_layout_one(file_path: str) -> str:
    """Footer-only ts-layout probe of ONE parquet file (O(KB) read)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    schema = pf.metadata.schema
    # INT96 (Spark's legacy timestamp encoding) also surfaces as
    # timestamp[ns] in the arrow schema, but Spark reads it as a plain
    # TIMESTAMP and the nanosAsLong conf does NOT apply — physical type
    # must be checked before the arrow logical type.
    for i in range(len(schema)):
        col = schema.column(i)
        if col.name == "ts":
            if col.physical_type == "INT96":
                return "ltz"
            break
    t = pf.schema_arrow.field("ts").type
    if getattr(t, "unit", None) == "ns" and getattr(t, "tz", None) is None:
        return "nanos"
    return "ntz" if getattr(t, "tz", None) is None else "ltz"


def events_ts_layout(path: str) -> str:
    """Probe parquet footers for the ``ts`` physical type. The fixture has
    shipped multiple layouts across driver rounds, so readers adapt:

    - ``"nanos"``: TIMESTAMP(NANOS) — Spark's vectorized reader rejects it;
      must be read as nanos-since-epoch long via the ``nanosAsLong`` conf.
    - ``"ntz"``: timestamp[us] without timezone — Spark surfaces
      TIMESTAMP_NTZ; naive wall times are UTC by fixture convention.
    - ``"ltz"``: UTC-adjusted timestamp[us] — plain TIMESTAMP, no fixup.

    EVERY matching file's footer is probed (not just the first): a
    directory mixing layouts would otherwise be silently normalised per
    one arbitrary file — that case raises instead. An empty match raises
    a clear FileNotFoundError (previously an opaque IndexError).

    Results are cached per **(file list, mtime, size)** fingerprint, not
    per path string: the fixture IS regenerated between driver rounds, so
    a long-lived process that straddles a regeneration must not reuse a
    stale layout (an ntz<->ltz flip silently shifts every instant). The
    fingerprint stat is O(files), footer parsing only happens on a miss.
    At deploy scale you'd pin one layout and delete this shim entirely.
    """
    import glob as _g

    files = sorted(_g.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"events_ts_layout: no parquet files match {path!r}")
    fingerprint = tuple(
        (f, int(os.stat(f).st_mtime_ns), os.stat(f).st_size) for f in files
    )
    return _events_ts_layout_cached(fingerprint)


@functools.lru_cache(maxsize=64)
def _events_ts_layout_cached(fingerprint: tuple) -> str:
    layouts = {_probe_ts_layout_one(f) for f, _mt, _sz in fingerprint}
    if len(layouts) > 1:
        raise ValueError(
            f"events_ts_layout: mixed ts layouts {sorted(layouts)}; "
            "a directory must be layout-homogeneous (split the read per layout)"
        )
    return layouts.pop()


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalise the events ``ts`` column to a plain TIMESTAMP holding the
    fixture's UTC instant, whatever layout the scan produced:

    - nanos-as-long → ``timestamp_micros(ts div 1000)`` (exact integer
      division — double division would lose precision at 1.7e18 ns),
    - TIMESTAMP_NTZ → ``to_utc_timestamp(ts, 'UTC')`` (naive-as-UTC,
      independent of the session timezone — a bare cast would shift under
      a non-UTC session),
    - TIMESTAMP → unchanged.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar scan, schema from parquet footer;
    ``events.ts`` is normalised to TIMESTAMP via :func:`normalize_events_ts`.

    SESSION INVARIANT: when the footer probe says TIMESTAMP(NANOS), the
    ``nanosAsLong`` conf stays set for the session's lifetime — it must be
    live whenever a lazily-built events plan executes, so a try/finally
    restore here would break any downstream action. The flag only changes
    behaviour for parquet files that actually carry TIMESTAMP(NANOS)
    columns (none of the other fixture tables do); any future nanos-parquet
    reader in this package must go through ``load_table``/``events_stream``
    so it inherits the same convention.
    """
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        if events_ts_layout(path) == "nanos":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
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


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with an EXPLICIT schema: at 100 TB schema inference
    is a full extra pass over the data — never let Spark infer here."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — footer statistics give the same filter pushdown and
    file pruning behavior as the parquet readers above."""
    return spark.read.orc(path)
