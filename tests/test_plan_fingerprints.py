"""Whole-catalog plan-shape regression gate (round-4 verdict item #2).

`tests/test_plans.py` asserts rich properties on the headline queries;
this test freezes the REST of the catalog: every query's physical plan is
reduced to a stats-stable fingerprint (join strategies, exchange count,
pushdown, Python-UDF presence, partial agg) and compared against the
committed PLAN_FINGERPRINTS.json snapshot. A lost pushdown or an
accidental CartesianProduct in any of the ~150 queries fails here with a
per-field diff instead of shipping silently.

Intentional plan changes: re-run ``python tools/plan_fingerprints.py``
(optionally with a comma-separated query list) and review the JSON diff.
"""

import json
import os

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_FINGERPRINTS.json")


def test_catalog_plan_fingerprints_match_snapshot(catalog_fingerprints):
    with open(SNAPSHOT) as f:
        expected = json.load(f)
    actual = catalog_fingerprints

    missing = sorted(set(actual) - set(expected))
    assert not missing, (
        f"queries with no committed fingerprint: {missing} — "
        "run `python tools/plan_fingerprints.py` and commit the snapshot"
    )
    stale = sorted(set(expected) - set(actual))
    assert not stale, f"snapshot entries for removed queries: {stale}"

    drift = {}
    for name in sorted(actual):
        diffs = {
            k: (expected[name].get(k), v)
            for k, v in actual[name].items()
            if expected[name].get(k) != v
        }
        if diffs:
            drift[name] = diffs
    assert not drift, (
        "physical-plan shape drift (expected, actual): "
        + json.dumps(drift, indent=1)
        + "\nIf intentional: python tools/plan_fingerprints.py "
        + ",".join(drift)
    )


def test_no_unbounded_cartesian_anywhere(spark, sf_dir):
    """Belt-and-braces on top of the snapshot: no catalog query may plan a
    CartesianProduct — the one node type with no 100 TB story. The engine's
    deliberate all-pairs shapes (range_band_join, broadcast scalar crosses)
    plan as BroadcastNestedLoopJoin with a bounded side.

    Sole allowlisted entry: ``als_top_recs`` — the cartesian lives inside
    MLlib's own ``ALSModel.recommendForUserSubset`` (a BLOCKED cross join
    of user-factor × item-factor blocks, MLlib's documented recommend-all
    top-k algorithm; both sides are factor matrices, not ratings, and the
    user side is a 20-row subset here)."""
    with open(SNAPSHOT) as f:
        fps = json.load(f)
    offenders = [n for n, fp in fps.items() if fp.get("cartesian") and n != "als_top_recs"]
    assert not offenders, offenders
