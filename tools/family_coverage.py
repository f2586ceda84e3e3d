#!/usr/bin/env python
"""Per-family second-decade coverage note for SCALING.json.

A "family" is a catalog tag (the registry's own taxonomy — operator
families like `dedup`, `window`, `table-format`, plus the reference's
§2 ids). The 100 TB claim rests on measured scaling, and one decade of
measurement only supports one decade of extrapolation — so every
family must have at least one sf1→sf10 (second decade) representative,
not just the heavy ones.

Writes a top-level ``family_coverage`` key into SCALING.json (the
scale_rehearsal tool preserves unknown top-level keys verbatim on its
merges): for each tag, the covering second-decade query with the WORST
(highest) recorded exponent — the family's most pessimistic measured
scaling — plus the list of uncovered tags, which must be empty.

Usage:
    python tools/family_coverage.py          # recompute + write
    python tools/family_coverage.py --check  # exit 1 if any family uncovered
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from svdmovie_lens_parallel_apache_spark_spark.catalog import REGISTRY
    import svdmovie_lens_parallel_apache_spark_spark.catalog_ml  # noqa: F401
    import svdmovie_lens_parallel_apache_spark_spark.catalog_pipeline  # noqa: F401
    import svdmovie_lens_parallel_apache_spark_spark.catalog_stream  # noqa: F401
    import svdmovie_lens_parallel_apache_spark_spark.catalog_text  # noqa: F401

    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)
    d2 = scaling.get("second_decade", {}).get("queries", {})

    by_family: dict[str, dict] = {}
    uncovered: list[str] = []
    for name, q in REGISTRY.items():
        for tag in q.tags:
            if name not in d2:
                by_family.setdefault(tag, {})
                continue
            exp = d2[name]["exponent"]
            cur = by_family.get(tag)
            if not cur or exp > cur.get("exponent", float("-inf")):
                by_family[tag] = {"query": name, "exponent": exp}
    uncovered = sorted(t for t, v in by_family.items() if not v)
    covered = {t: v for t, v in sorted(by_family.items()) if v}
    worst = max(
        (v["exponent"] for v in covered.values()), default=None
    )
    note = {
        "definition": "family = catalog tag; entry = the covering "
        "second-decade (sf1->sf10) query with that family's WORST "
        "recorded exponent",
        "families_total": len(by_family),
        "families_covered": len(covered),
        "uncovered": uncovered,
        "worst_exponent_any_family": worst,
        "by_family": covered,
    }
    if "--check" in sys.argv:
        print(json.dumps({k: note[k] for k in (
            "families_total", "families_covered", "uncovered",
            "worst_exponent_any_family",
        )}))
        sys.exit(1 if uncovered else 0)
    scaling["family_coverage"] = note
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1, sort_keys=True)
    print(json.dumps({k: note[k] for k in (
        "families_total", "families_covered", "uncovered",
        "worst_exponent_any_family",
    )}))


if __name__ == "__main__":
    main()
