"""Interchange-format round-trips: JSONL (gzip) and ORC.

The engine's canonical storage is parquet; these formats are the
import/export surface (JSONL for training-data tooling, ORC for
Hive/Trino stacks). Each round-trip must preserve schema and values
exactly, and the ORC scan must push filters like the parquet path does.
"""

import re

from pyspark.sql import functions as F

from svdmovie_lens_parallel_apache_spark_spark.sources.readers import (
    load_table,
    read_jsonl,
    read_orc,
)
from svdmovie_lens_parallel_apache_spark_spark.sources.writers import (
    write_jsonl,
    write_orc,
)


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_jsonl_roundtrip_gzip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    import glob

    assert glob.glob(out + "/*.json.gz"), "expected gzipped jsonl shards"
    back = read_jsonl(spark, out, docs.schema)
    assert back.schema == docs.schema
    assert _canon(back) == _canon(docs)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_orc")
    write_orc(cust, out)
    back = read_orc(spark, out)
    assert back.schema == cust.schema
    assert _canon(back) == _canon(cust)
    plan = (
        back.where(F.col("c_custkey") == 42)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "c_custkey" in plan and ("PushedFilters" in plan or "pushed" in plan.lower())


def test_orc_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    import os

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc_part")
    write_orc(docs, out, partition_by=["lang"])
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2
    back = read_orc(spark, out).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition predicate must prune directories, not filter rows post-scan:
    # a NON-EMPTY PartitionFilters entry naming lang — a post-scan row
    # Filter would still mention lang, so no fallback on that
    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert m is not None and "lang" in m.group(1), plan
    n_en = docs.where(F.col("lang") == "en").count()
    assert back.count() == n_en
