#!/usr/bin/env python
"""A/B: refresh_aggregate_views (shared CDC diff) vs three individual
refreshes over the same mixed append+update delta. Results recorded in
SCALING.json["mv_multi_view_ab"].

Usage: python tools/mv_multi_ab.py scratch/sf10
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
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

fixture = sys.argv[1] if len(sys.argv) > 1 else "scratch/sf1"
orders = (
    spark.read.parquet(os.path.join(fixture, "orders.parquet"))
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
    .withColumn("band", F.floor(F.col("o_totalprice") / 5000).cast("long"))
)
orders.count()

S1 = dict(group_by=["band"],
          sums={"s": "CAST(o_totalprice AS DECIMAL(18,6))"},
          count_col="cnt")
S2 = dict(group_by=["o_orderstatus"],
          mins={"m": "o_totalprice"}, maxs={"x": "o_totalprice"},
          count_col="cnt")
S3 = dict(group_by={"kb": "o_orderkey % 16"},
          sums={"s": "CAST(o_totalprice AS DECIMAL(18,6))"},
          count_col="cnt")


def setup(tag):
    root = tempfile.mkdtemp(prefix=f"mvab-{tag}-")
    src = root + "/src"
    st.write_snapshot(orders.where("o_orderkey % 2 = 0"), src)
    views = {root + f"/v{i}": s for i, s in enumerate((S1, S2, S3))}
    mv.refresh_aggregate_views(spark, src, views)
    # a mixed delta: append + an update (delete+insert pairs)
    st.write_snapshot(orders.where("o_orderkey % 2 = 1"), src,
                      mode="append")
    st.update_where(spark, src,
                    {"o_totalprice": "o_totalprice + 1.00"},
                    "o_orderkey % 97 = 0")
    return src, views


src, views = setup("shared")
t = time.time()
mv.refresh_aggregate_views(spark, src, views)
shared_s = round(time.time() - t, 3)

src2, views2 = setup("solo")
t = time.time()
for v, s in views2.items():
    mv.refresh_aggregate_view(spark, src2, v, **s)
solo_s = round(time.time() - t, 3)

print(json.dumps({"fixture": fixture, "n_views": 3,
                  "shared_s": shared_s, "solo_s": solo_s,
                  "speedup": round(solo_s / shared_s, 2)}))
