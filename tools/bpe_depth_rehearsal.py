#!/usr/bin/env python
"""BPE merge-depth rehearsal (round-4 verdict item #5).

``bpe_merge_rounds`` trains 3 merges; real tokenizers run tens of
thousands. The scale claim (DEPLOY.md) is that per-round cost is FLAT:
each round pays one pair-count shuffle + one bounded limit(1) argmax
collect, and ``localCheckpoint`` truncates the lineage so round 50 is the
same job shape as round 1. This tool measures it: 50 merge rounds over
the sf0.1 documents corpus, per-round wall seconds recorded into
SCALING.json under ``bpe_depth`` with a log-log trend slope
(exponent ~0 = flat, >0 = per-round cost grows with depth).

Usage:
    python tools/bpe_depth_rehearsal.py [rounds] [sf_dir]
"""
from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def trend_exponent(times: list[float], skip_warmup: int = 2) -> float:
    """Least-squares slope of log(t_round) vs log(round index) after
    warmup — the per-round scaling exponent in depth."""
    pts = [
        (math.log(i + 1), math.log(max(t, 1e-3)))
        for i, t in enumerate(times)
        if i >= skip_warmup
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 3)


def main() -> None:
    import tempfile
    import statistics

    tempfile.tempdir = tempfile.mkdtemp(prefix="svdml-bpedepth-root-")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from svdmovie_lens_parallel_apache_spark_spark import get_spark
    from svdmovie_lens_parallel_apache_spark_spark.catalog_pipeline import _bpe_train

    spark = get_spark(app_name="svdml-bpe-depth")
    spark.sparkContext.setLogLevel("ERROR")
    times: list[float] = []
    merges, _ = _bpe_train(spark, sf_dir, rounds=rounds, round_times=times)
    warm = times[2:]
    rec = {
        "rounds": rounds,
        "sf_dir": sf_dir,
        "round_times_s": times,
        "t_round_median_s": round(statistics.median(warm), 3),
        "t_first5_median_s": round(statistics.median(times[2:7]), 3),
        "t_last5_median_s": round(statistics.median(times[-5:]), 3),
        "depth_exponent": trend_exponent(times),
        "last_merge": list(merges[-1]),
    }
    print(f"# bpe_depth: {rec}", file=sys.stderr)

    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        full = json.load(f)
    full["bpe_depth"] = rec
    with open(path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
