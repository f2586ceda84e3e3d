#!/usr/bin/env python
"""Measure that materialized-view refresh cost is O(delta), not
O(source) — the scale claim `sources/materialized_view.py` makes.

Protocol (PLANS.md round-13 method notes: fresh-session runs, fixtures
pre-touched, min-of-2 adjudication happens across invocations):

  for each fixture (scratch/sf1, scratch/sf10 — 1.5M vs 15M orders):
    1. build a band-clustered snapshot source (stats on band)
    2. FULL BUILD the view (timed — expected to scale with source)
    3. append a CONSTANT-SIZE delta (the sf0.001 orders, 1.5k rows,
       keys negated to avoid collisions) -> refresh (timed — the
       insert-only fast path must be ~FLAT across the decade: it
       reads the delta and the touched-group view rows only)
    4. delete ONE fine band (delete_where prune-bounded) -> refresh
       (timed — the dirty path is O(that band's rows): linear in
       source but ~1/№bands of it; report refresh/rebuild ratio)

Writes the block to stdout as JSON; the caller merges the min-of-N
into SCALING.json["mv_rehearsal"].

Usage: python tools/mv_rehearsal.py scratch/sf1
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "scratch/sf1"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from svdmovie_lens_parallel_apache_spark_spark.sources import (
        materialized_view as mv,
        snapshot_table as st,
    )

    def bands(df):
        # ~110 fine price bands so a one-band delete dirties ~1% of rows
        return df.select("o_orderkey", "o_totalprice").withColumn(
            "band", F.floor(F.col("o_totalprice") / 5000).cast("long")
        )

    orders = bands(spark.read.parquet(os.path.join(fixture, "orders.parquet")))
    delta = bands(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    ).withColumn("o_orderkey", -F.col("o_orderkey"))
    orders.count()  # pre-touch
    delta.count()

    spec = dict(
        group_by=["band"],
        sums={"sum_price": "CAST(o_totalprice AS DECIMAL(18,6))"},
        mins={"min_price": "o_totalprice"},
        maxs={"max_price": "o_totalprice"},
        count_col="cnt",
    )
    root = tempfile.mkdtemp(prefix="svdml-mvreh-")
    src, view = root + "/src", root + "/view"
    out = {"fixture": fixture, "source_rows": orders.count()}
    try:
        t = time.time()
        st.write_snapshot(
            orders.repartitionByRange(32, "band").sortWithinPartitions(
                "band"
            ),
            src,
            stats_cols=["band"],
        )
        out["build_source_s"] = round(time.time() - t, 3)

        t = time.time()
        mv.refresh_aggregate_view(spark, src, view, **spec)
        out["full_build_s"] = round(time.time() - t, 3)

        st.write_snapshot(delta, src, mode="append", stats_cols=["band"])
        t = time.time()
        mv.refresh_aggregate_view(spark, src, view, **spec)
        out["insert_only_refresh_s"] = round(time.time() - t, 3)

        st.delete_where(spark, src, "band = 30", prune=("band", 30, 30))
        t = time.time()
        mv.refresh_aggregate_view(spark, src, view, **spec)
        out["delete_band_refresh_s"] = round(time.time() - t, 3)

        # honesty check the timings mean what they claim
        final = st.read_snapshot(spark, view)
        full = (
            st.read_snapshot(spark, src)
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum(
                    F.expr("CAST(o_totalprice AS DECIMAL(18,6))")
                ).alias("sum_price"),
                F.min("o_totalprice").alias("min_price"),
                F.max("o_totalprice").alias("max_price"),
            )
            .select(*final.columns)
        )
        out["equiv"] = bool(
            final.exceptAll(full).limit(1).count() == 0
            and full.exceptAll(final).limit(1).count() == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
