#!/usr/bin/env python
"""k-sweep rehearsal for the vectorized k-means assignment path.

``kmeans_lloyd``'s 100 TB story says k is the knob a big corpus raises
(SemDeDup wants k ∝ corpus size, 10⁴–10⁵ at real scale). The literal
when-chain path could never turn that knob (its expression tree grows
~2^k and analysis OOMs at k≈13 — measured); the vectorized path claims
plan size CONSTANT in k and cost ~linear in k inside NumPy. This tool
turns that claim into evidence: at a fixed corpus (scratch/sf10,
200k × dim-64 embeddings), time ONE full assignment pass at k = 8,
256, 2048 (each min-of-2 — see the bench-timing memory: never trust
one sample) and fit the k-exponent

    exponent = log(t(k_hi) / t(k_lo)) / log(k_hi / k_lo)

over the measured tail (256 -> 2048, past the fixed per-pass overhead
of scan + Arrow transfer that dominates small k). ~1.0 = linear in k,
as the argmin matmul predicts; plan size is asserted constant (one
ArrowEvalPython node at every k).

Writes the result under the ``kmeans_k_sweep`` key of SCALING.json.

Usage:
    python tools/kmeans_k_sweep.py [sf_dir]      # default scratch/sf10
"""
from __future__ import annotations

import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALING = os.path.join(REPO, "SCALING.json")
KS = (8, 256, 2048)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scratch", "sf10")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from svdmovie_lens_parallel_apache_spark_spark.operators.similarity import (
        _assign_blas,
        _assign_vectorized,
        kmeans_lloyd,
    )
    from svdmovie_lens_parallel_apache_spark_spark.plans.explain import formatted_plan
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("kmeans-k-sweep")
        .getOrCreate()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out: dict = {"sf_dir": sf_dir, "n_vectors": n, "ks": {}}
    for k in KS:
        # one converged-state assignment pass: centroids from a 1-iter
        # fit (so the sweep times the ASSIGNMENT, the per-pass cost the
        # k knob multiplies, not the k-independent update agg)
        handles: list = []
        df, cents = kmeans_lloyd(
            emb, k=k, iters=1, assign="vectorized", release=handles
        )
        base = df.select("vec_id", "vec")
        base.count()  # warm the persisted projection + Python workers
        times = []
        for _ in range(2):
            t0 = time.time()
            # sum(cid) forces the UDF: a bare count() would let Catalyst
            # prune the (deterministic) UDF column and time the cache
            timed, bc = _assign_vectorized(base, cents)
            timed.agg({"cid": "sum"}).collect()
            bc.unpersist()
            times.append(time.time() - t0)
        blas_times = []
        for _ in range(2):
            t0 = time.time()
            timed, bc = _assign_blas(base, cents)
            timed.agg({"cid": "sum"}).collect()
            bc.unpersist()
            blas_times.append(time.time() - t0)
        # assignment-equality spot gate (the pytest gate runs at k=64;
        # this re-checks at every swept k on the big fixture)
        vec_df, vbc = _assign_vectorized(base, cents)
        blas_df, bbc = _assign_blas(base, cents)
        mismatches = (
            vec_df.select("vec_id", "cid")
            .join(
                blas_df.select("vec_id", F.col("cid").alias("cid_b")),
                "vec_id",
            )
            .where(F.col("cid") != F.col("cid_b"))
            .count()
        )
        vbc.unpersist(); bbc.unpersist()
        plan_df, pbc = _assign_vectorized(base, cents)
        plan = formatted_plan(plan_df)
        pbc.unpersist()
        udf_nodes = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.MULTILINE))
        out["ks"][str(k)] = {
            "assign_pass_s": round(min(times), 3),
            "blas_assign_pass_s": round(min(blas_times), 3),
            "blas_assign_mismatches": mismatches,
            "n_centroids_alive": len(cents),
            "plan_udf_nodes": udf_nodes,
        }
        for h in handles:
            h.unpersist()
        print(
            f"k={k}: assign pass {min(times):.3f}s / blas "
            f"{min(blas_times):.3f}s, {mismatches} mismatches "
            f"({udf_nodes} UDF node)"
        )
    t_lo = out["ks"][str(KS[1])]["assign_pass_s"]
    t_hi = out["ks"][str(KS[2])]["assign_pass_s"]
    out["k_exponent_tail"] = round(
        math.log(t_hi / t_lo) / math.log(KS[2] / KS[1]), 3
    )
    out["note"] = (
        "assignment-pass time vs k at fixed corpus; exponent fit on the "
        f"{KS[1]}->{KS[2]} tail (below that, scan+Arrow fixed cost "
        "dominates). literal path OOMs analysis at k~13 (~2^k plan nodes). "
        "blas_assign_pass_s is the opt-in GEMM form (assign='blas'), "
        "assignment-equality spot-checked per k (blas_assign_mismatches)."
    )
    print(f"k-exponent ({KS[1]}->{KS[2]}): {out['k_exponent_tail']}")
    with open(SCALING) as f:
        scaling = json.load(f)
    scaling["kmeans_k_sweep"] = out
    with open(SCALING, "w") as f:
        json.dump(scaling, f, indent=1, sort_keys=True)
    print(f"wrote kmeans_k_sweep -> {SCALING}")
    spark.stop()


if __name__ == "__main__":
    main()
