#!/usr/bin/env python
"""Natural-threshold distributed connected-components rehearsal.

The r4 verdict's residual on the CC fallback: the distributed min-label
path had only ever run under a FORCED ``driver_edge_threshold=0`` — no
fixture naturally exceeded the 1M-edge gate. This rehearsal closes that:
it builds a dup-heavy corpus (the pathological crawl shape the
distributed path exists for), runs the REAL pipeline — MinHash band-join
pair generation → ``dedup_clusters`` with the DEFAULT threshold — and
the edge count crosses 1M on its own, so the distributed fixpoint
engages for the production reason, not a test override.

Corpus: N_SRC source docs from the rehearsal fixture × N_REP replicas,
each replica appending one distinct token (near-dup, not exact-dup, so
MinHash verification does real work). Near-dup pairs per source group
≈ C(N_REP, 2); defaults give ~1.3M pairs → ~2.6M symmetrised edges.

Correctness at scale: the SAME edge set is clustered twice —
distributed min-label fixpoint (natural path) vs driver union-find
(forced via a huge threshold) — and the two labelings must be
row-identical. That upgrades tests/test_pipeline_ops.py's small forced
equality check to the actual >1M-edge regime.

Writes results under ``cc_natural_rehearsal`` in SCALING.json (bench.py
embeds the file into the committed bench artifact).

Usage:
    python tools/cc_natural_rehearsal.py [n_src] [n_rep]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_FIXTURE = os.environ.get("SPARK_GRAFT_SMALL_SF", "/root/testdata/sf0.1")


def main() -> None:
    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from pyspark.sql import functions as F

    from svdmovie_lens_parallel_apache_spark_spark import get_spark
    from svdmovie_lens_parallel_apache_spark_spark.operators.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    spark = get_spark(app_name="svdml-cc-natural-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # dup-heavy corpus: doc_id' = src_doc_id * n_rep + i keeps replica
    # groups contiguous and disjoint; each replica appends ONE distinct
    # token so pairs are near-dups (shingle Jaccard ~0.9), not exact dups
    docs = (
        load_table(spark, SRC_FIXTURE, "documents")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .limit(n_src)
        .crossJoin(spark.range(n_rep).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * n_rep + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
            "lang",
        )
    ).localCheckpoint(eager=True)
    n_docs = docs.count()

    t0 = time.time()
    pairs = minhash_dedup_pairs(docs, k=8, band_size=2, threshold=0.5).select(
        "doc_a", "doc_b"
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    # symmetrised-distinct edge count — the quantity the 1M gate tests
    n_sym_edges = 2 * n_pairs  # doc_a < doc_b by construction, so exact
    assert n_sym_edges > 1_000_000, (
        f"corpus did not cross the driver-edge threshold naturally "
        f"({n_sym_edges} edges); raise n_src/n_rep"
    )

    t0 = time.time()
    dist = dedup_clusters(pairs)  # DEFAULT threshold: distributed path
    dist_rows = {(r.doc_id, r.cluster_id) for r in dist.collect()}
    t_cc_dist = time.time() - t0

    t0 = time.time()
    driver = dedup_clusters(pairs, driver_edge_threshold=1 << 62)
    driver_rows = {(r.doc_id, r.cluster_id) for r in driver.collect()}
    t_cc_driver = time.time() - t0

    assert dist_rows == driver_rows, (
        f"distributed CC diverged from union-find ground truth: "
        f"{len(dist_rows ^ driver_rows)} differing rows"
    )

    # structural sanity: every replica group is fully connected, so all
    # n_rep replicas of one source doc must share a cluster label
    n_groups_split = (
        dist.groupBy((F.col("doc_id") / n_rep).cast("long").alias("grp"))
        .agg(F.count_distinct("cluster_id").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert n_groups_split == 0, f"{n_groups_split} replica groups were split"

    rec = {
        "src_fixture": SRC_FIXTURE,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "n_sym_edges": n_sym_edges,
        "edge_threshold_default": 1_000_000,
        "path": "distributed (natural crossing)",
        "t_pairs_s": round(t_pairs, 3),
        "t_cc_distributed_s": round(t_cc_dist, 3),
        "t_cc_driver_unionfind_s": round(t_cc_driver, 3),
        "n_clusters": len({c for _, c in dist_rows}),
        "distributed_equals_unionfind": True,
        "replica_groups_split": 0,
    }
    path = os.path.join(REPO, "SCALING.json")
    payload = {}
    if os.path.exists(path):
        with open(path) as f:
            payload = json.load(f)
    payload["cc_natural_rehearsal"] = rec
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
