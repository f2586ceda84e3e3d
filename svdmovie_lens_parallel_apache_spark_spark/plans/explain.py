"""Physical-plan inspection utilities.

The reference hand-authored its plan (RDD lineage); here Catalyst owns it,
and these helpers make the *shape* of the chosen plan assertable in tests:
filters pushed into the parquet scan, projections pruned to ReadSchema,
small dims broadcast, the relational hot path free of Python UDFs, and
whole-stage codegen covering the operator spine. These are the properties
that decide whether the same code is fast at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_summary(df: DataFrame) -> dict:
    """Structural facts about the physical plan.

    Node counts come from the formatted plan's detail headers
    ``(N) NodeName`` so the tree rendering doesn't double-count.
    """
    import re

    plan = formatted_plan(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.MULTILINE)
    return {
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "broadcast_joins": sum(n == "BroadcastHashJoin" for n in nodes),
        "sortmerge_joins": sum(n == "SortMergeJoin" for n in nodes),
        "has_python_udf": ("BatchEvalPython" in plan)
        or ("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan),
        # map-side combine: partial_* aggregate functions before the Exchange
        "partial_agg": "partial_" in plan,
        "exchanges": sum(n == "Exchange" for n in nodes),
        "scans": sum(n == "Scan" for n in nodes),
        "nodes": nodes,
    }


def assert_no_python_udf(df: DataFrame) -> None:
    s = plan_summary(df)
    assert not s["has_python_udf"], "Python UDF found in a plan that should be JVM-only"


def executed_plan(df: DataFrame) -> str:
    """FINAL physical plan string — call AFTER an action has run the query.

    With AQE the plan is re-optimized per stage at runtime (skew-join
    splits, partition coalescing, join-strategy switches); the pre-action
    formatted plan never shows those, so runtime-shape assertions (e.g.
    ``SortMergeJoin(skew=true)``, ``AQEShuffleRead coalesced and skewed``)
    must read this one."""
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the parquet scan (column pruning proof)."""
    import re

    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return sorted(cols)


def plan_fingerprint(df: DataFrame) -> dict:
    """Canonical, committable physical-plan shape for regression snapshots.

    A reduced, stats-stable projection of :func:`plan_summary`: the fields
    that decide 100 TB behavior (join strategies, shuffle count, pushdown,
    Python-worker presence, map-side combine) without anything that varies
    run-to-run (partition counts, codegen stage ids, file split counts).
    ``tools/plan_fingerprints.py`` snapshots the whole catalog into
    PLAN_FINGERPRINTS.json and ``tests/test_plan_fingerprints.py`` asserts
    equality — a lost pushdown or an accidental cartesian in ANY of the
    catalog queries fails a test instead of landing silently.
    """
    s = plan_summary(df)
    nodes = s["nodes"]
    return {
        "pushed_filters": s["pushed_filters"],
        "broadcast_joins": s["broadcast_joins"],
        "sortmerge_joins": s["sortmerge_joins"],
        "shuffled_hash_joins": sum(n == "ShuffledHashJoin" for n in nodes),
        "bnl_joins": sum(n == "BroadcastNestedLoopJoin" for n in nodes),
        "cartesian": sum(n == "CartesianProduct" for n in nodes),
        "exchanges": s["exchanges"],
        "scans": s["scans"],
        "python_udf": s["has_python_udf"],
        "partial_agg": s["partial_agg"],
    }
