"""Shuffle-volume regression guard (round-4 verdict item #6).

Plan-shape gates can't catch a quiet pair-explosion: a dedup/ANN edit
whose candidate set goes quadratic still planes the same nodes and still
matches its oracle at toy SF — only the BYTES through the exchanges give
it away. `tools/shuffle_audit.py` measures shuffle-write vs input bytes
for every catalog query (committed in SHUFFLE_AUDIT.json); this test

1. re-measures the pair-generating risk family LIVE and asserts each
   query stays within a generous multiple of its committed baseline
   (8x / +2.0 absolute — wide enough for fixture regeneration and
   partition-count differences, narrow enough that a candidate set
   growing from O(n) to O(n^2) at sf0.01 trips it by 10-100x);
2. asserts the COMMITTED audit — all ~150 queries, refreshed per round by
   the audit tool — stays under absolute per-family amplification caps.

After an intentional change to a query's shuffle profile:
    python tools/shuffle_audit.py <changed,query,names>
"""

import json
import os

import pytest

AUDIT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE_AUDIT.json"
)
AUDIT_SF = "/root/testdata/sf0.01"

# the queries whose mechanism COULD go quadratic: candidate-pair
# generation, LSH banding, graph edge expansion, composed pipelines
RISK_QUERIES = [
    "copurchase_pairs",
    "dedup_jaccard_pairs",
    "dedup_clusters",
    "dedup_minhash",
    "dedup_minhash_mllib",
    "dedup_simhash",
    "dedup_exact",
    "benchmark_decontamination",
    "dedup_embedding_cosine",
    "dedup_keep_best",
    "embedding_dedup_clusters",
    "ann_lsh_buckets",
    "ann_brp_knn_mllib",
    "pagerank_bipartite",
    "pipeline_e2e",
]

# absolute amplification ceilings by measured envelope (sf0.01 audit).
# NOTE on units: local-mode input_bytes is per-file fixed accounting, not
# bytes scanned (plans/metrics.py docstring, measured) — so these ratios
# are RELATIVE per-query fingerprints whose absolute magnitude is
# meaningless but whose DRIFT is the regression signal. Envelope at
# sf0.01: pair-generation tops out at ~308 (copurchase_pairs), the events
# window family at ~78, everything else under ~31; caps are ~3-4x that.
FAMILY_CAPS = {
    "copurchase_pairs": 1200.0,
    "dedup_jaccard_pairs": 700.0,
    "dedup_clusters": 550.0,
    "pipeline_e2e": 450.0,
    "ann_brp_knn_mllib": 80.0,
    "movielens_replay": 30.0,
    # Python DataSource scan reports no input_bytes to the stage metrics
    # (generated rows, not file reads), so the ratio degenerates to
    # sw/1 = absolute shuffle bytes — cap it in BYTES (the 5-row agg
    # shuffles ~3 KB; 64 KB of headroom still trips on any explosion)
    "synthetic_source_stats": 65536.0,
    "synthetic_source_pushdown": 65536.0,
}
DEFAULT_CAP = 320.0


def _audit_block():
    with open(AUDIT_PATH) as f:
        return json.load(f)[AUDIT_SF]


def test_committed_audit_within_family_caps():
    block = _audit_block()
    breaches = {
        name: (m["amplification"], FAMILY_CAPS.get(name, DEFAULT_CAP))
        for name, m in block.items()
        if m["amplification"] > FAMILY_CAPS.get(name, DEFAULT_CAP)
    }
    assert not breaches, f"(amplification, cap): {breaches}"


@pytest.fixture(scope="module")
def live_amplifications(spark):
    """One pass over the risk family at the audit SF, measured with the
    same stage-attribution probe the audit tool uses."""
    from tools.shuffle_audit import audit

    return audit(spark, AUDIT_SF, RISK_QUERIES)


def test_risk_family_live_within_baseline(live_amplifications):
    baseline = _audit_block()
    breaches = {}
    for name in RISK_QUERIES:
        base = baseline[name]["amplification"]
        live = live_amplifications[name]["amplification"]
        limit = max(8.0 * base, base + 2.0)
        if live > limit:
            breaches[name] = {"live": live, "baseline": base, "limit": round(limit, 2)}
    assert not breaches, (
        f"shuffle amplification regressions: {breaches} — if intentional, "
        "re-run `python tools/shuffle_audit.py` and commit SHUFFLE_AUDIT.json"
    )


def test_audit_covers_whole_catalog():
    import __spark_entry__ as entry

    block = _audit_block()
    missing = sorted(set(entry.queries()) - set(block))
    assert not missing, (
        f"queries with no shuffle audit: {missing} — "
        "run `python tools/shuffle_audit.py` and commit"
    )


def test_shuffle_volume_grows_linearly_across_sf():
    """THE quadratic detector (sharper than any within-SF ratio): for the
    pair-generating risk family, shuffle-write bytes must grow ~linearly
    with the corpus — sw(sf0.1)/sw(sf0.01) <= 22 for 10x the data (2.2x
    headroom over linear; a quadratic candidate set would measure ~100x).
    Uses the committed audit blocks (both refreshed by
    tools/shuffle_audit.py); queries below a 64 KiB floor in either block
    are skipped (absolute bytes too small to carry signal)."""
    with open(AUDIT_PATH) as f:
        audit = json.load(f)
    small = audit["/root/testdata/sf0.01"]
    big = audit.get("/root/testdata/sf0.1", {})
    floor = 64 * 1024
    checked, breaches = [], {}
    for name in RISK_QUERIES:
        if name not in big:
            continue
        s, b = small[name]["shuffle_write_bytes"], big[name]["shuffle_write_bytes"]
        if s < floor or b < floor:
            continue
        ratio = b / s
        checked.append(name)
        if ratio > 22.0:
            breaches[name] = round(ratio, 1)
    assert len(checked) >= 5, f"too few measurable queries: {checked}"
    assert not breaches, (
        f"superlinear shuffle growth at 10x data: {breaches} — "
        "a candidate set is exploding; check band/bucket caps"
    )
