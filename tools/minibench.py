#!/usr/bin/env python
"""Min-of-N timing for a subset of catalog queries, kernel-normalized.

Round-13 A/B harness: same methodology as bench.py (warm session,
count() action, min over passes, per-query isolation, the pure-JVM
calibration kernel) but over an explicit query list so an optimization
can be measured in minutes instead of a full 224-query suite run.
Ratios (seconds / kernel_sec) are the drift-resistant comparator on
this host (observed single-run wall variance: up to 1.8x).

Usage:
    python tools/minibench.py q1,q2,... [passes=3] [sf_dir]
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BENCH_TMP = tempfile.mkdtemp(prefix="svdml-minibench-root-")
tempfile.tempdir = _BENCH_TMP


def _calibrate(spark):
    from pyspark.sql import functions as F

    best = None
    for _ in range(3):
        t = time.time()
        spark.range(0, 600_000_000, 1, 64).select(
            F.expr("bit_xor(xxhash64(id))").alias("h")
        ).collect()
        dt = time.time() - t
        best = dt if best is None or dt < best else best
    return best


def main():
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from svdmovie_lens_parallel_apache_spark_spark import get_spark

    spark = get_spark(app_name="svdml-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import (
        load_table,
    )

    for t in ("lineitem", "events", "documents", "embeddings", "orders"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    baseline_tables = {t.name for t in spark.catalog.listTables()}

    def _isolate():
        for q in spark.streams.active:
            q.stop()
        for t in spark.catalog.listTables():
            if t.name not in baseline_tables:
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
        spark.catalog.clearCache()
        for d in glob.glob(os.path.join(_BENCH_TMP, "svdml-*")):
            shutil.rmtree(d, ignore_errors=True)

    kern_pre = _calibrate(spark)
    out = {}
    for name in names:
        best = None
        for _ in range(passes):
            t = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t
            best = dt if best is None or dt < best else best
            _isolate()
        out[name] = best
    kern_post = _calibrate(spark)
    kern = min(kern_pre, kern_post)
    res = {
        "kernel_sec": round(kern, 4),
        "kernel_pre": round(kern_pre, 4),
        "kernel_post": round(kern_post, 4),
        "queries": {q: round(s, 3) for q, s in out.items()},
        "normalized": {q: round(s / kern, 2) for q, s in out.items()},
    }
    print(json.dumps(res, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
