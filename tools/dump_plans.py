#!/usr/bin/env python
"""Dump .explain('formatted') for catalog queries to <outdir>/<q>_<suffix>.txt.

Round-13 evidence tool: run once against the pre-optimization tree and
once against the optimized tree to produce the plans/r13/ before/after
pairs. Harness-style queries (snapshot/streaming rehearsals) execute
their imperative setup while building, so this runs the full builder and
captures the RETURNED DataFrame's plan.

Usage:
    python tools/dump_plans.py <outdir> <suffix> <q1,q2,...> [sf_dir]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    os.makedirs(outdir, exist_ok=True)

    from svdmovie_lens_parallel_apache_spark_spark import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building {name}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
