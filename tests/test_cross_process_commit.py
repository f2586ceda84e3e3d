"""Cross-PROCESS commit races (round-9 verdict item #4).

Every concurrency test elsewhere drives the claim protocol from
threads inside one process; the ``os.link`` put-if-absent primitive is
exactly the thing whose semantics differ across processes and
filesystems (a same-process dentry cache can mask what two independent
processes see). These tests spawn real ``multiprocessing`` workers —
fresh interpreters via the 'spawn' context, no shared Python state, no
Spark in the children (the committers raced here are pure-metadata) —
against one table and assert the protocol's two guarantees at process
granularity:

1. exactly ONE winner per version number (the direct claim race);
2. NO lost commits: concurrent rebasing committers all land, versions
   stay contiguous, and every commit's effect is visible.
"""

import json
import multiprocessing as mp
import os

import pytest
from pyspark.sql import functions as F

from svdmovie_lens_parallel_apache_spark_spark.sources import snapshot_table as st
from svdmovie_lens_parallel_apache_spark_spark.sources.snapshot_table import (
    latest_version,
    read_snapshot,
    snapshot_history,
    write_snapshot,
)


@pytest.fixture()
def docs(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def _claim_worker(table, version, wid, barrier, q):
    """Claim one specific version number with a marker payload — all
    workers released by the barrier at once to maximize collision."""
    try:
        snap = dict(st._load_snapshot(table, version - 1))
        snap.update(
            {"version": version, "parent": version - 1,
             "operation": "append", "properties": {"winner": wid}}
        )
        tmp = os.path.join(table, "_tmp", f"race-{wid}")
        barrier.wait(timeout=60)
        q.put((wid, st._claim_snapshot(table, tmp, snap)))
    except Exception as e:  # surfaced by the assert below
        q.put((wid, repr(e)))


def _drop_worker(table, buckets, q):
    """A rebasing committer: drop several partitions, one commit each
    (pure metadata — the claim loop re-derives on every lost race)."""
    try:
        from svdmovie_lens_parallel_apache_spark_spark.sources.snapshot_table import (
            drop_partition,
        )

        got = [
            drop_partition(table, {"bucket(16, doc_id)": b}) for b in buckets
        ]
        q.put(("ok", buckets, got))
    except Exception as e:
        q.put(("err", buckets, repr(e)))


def _publish_worker(table, q):
    """The WAP publisher racing the drop committers: publish_branch is
    pure metadata too. It either wins the version claim before any drop
    lands, or raises the documented fork-base conflict — silently
    losing a commit is the only wrong outcome."""
    try:
        from svdmovie_lens_parallel_apache_spark_spark.sources.snapshot_table import (
            publish_branch,
        )

        q.put(("published", publish_branch(table, "ingest")))
    except ValueError as e:
        assert "cannot publish" in str(e)
        q.put(("conflict", str(e)))
    except Exception as e:
        q.put(("err", repr(e)))


def test_cross_process_same_version_claim_single_winner(spark, docs, tmp_path):
    """8 independent PROCESSES race os.link on ONE version number:
    exactly one True, and the committed file holds the winner's
    payload (not a torn mix)."""
    table = str(tmp_path / "t")
    write_snapshot(docs, table)
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    barrier = ctx.Barrier(8)
    procs = [
        ctx.Process(target=_claim_worker, args=(table, 2, w, barrier, q))
        for w in range(8)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=60)
    errs = [r for r in results if not isinstance(r[1], bool)]
    assert not errs, errs
    winners = [wid for wid, ok in results if ok]
    assert len(winners) == 1, results
    committed = st._load_snapshot(table, 2)
    assert committed["properties"]["winner"] == winners[0]
    assert latest_version(table) == 2


def test_cross_process_writers_and_publisher_no_lost_commits(
    spark, docs, tmp_path
):
    """4 drop-partition writer processes (3 commits each) race one
    publisher process: versions stay contiguous with one file per
    version, every successful commit's effect is visible (the dropped
    buckets are gone; the publish's rows present iff it won), and
    nothing is silently lost."""
    table = str(tmp_path / "t")
    en = docs.where(F.col("lang") == "en")
    write_snapshot(en, table, partition_by=["bucket(16, doc_id)"])  # v1
    st.create_branch(table, "ingest")
    write_snapshot(
        docs.where(F.col("lang") == "de"), table, branch="ingest"
    )  # staged window, invisible to main
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    assignments = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)]
    procs = [
        ctx.Process(target=_drop_worker, args=(table, list(bs), q))
        for bs in assignments
    ] + [ctx.Process(target=_publish_worker, args=(table, q))]
    for p in procs:
        p.start()
    results = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert not [r for r in results if r[0] == "err"], results
    published = [r for r in results if r[0] == "published"]
    n_commits = 12 + len(published)
    assert latest_version(table) == 1 + n_commits
    # contiguous history, exactly one snapshot file per version
    hist = snapshot_history(table)
    assert [s["version"] for s in hist] == list(range(1, 2 + n_commits))
    files = sorted(os.listdir(os.path.join(table, "_snapshots")))
    assert len(files) == len(set(files)) == 1 + n_commits
    for f in files:  # every winner wrote a complete, parseable commit
        json.load(open(os.path.join(table, "_snapshots", f)))
    # no lost drops: every dropped bucket (the probes are SOURCE
    # doc_ids, mapped through the hidden transform like any reader's)
    # is gone from the live set, and the survivors are EXACTLY the
    # expected rows — en (plus de iff the publish won) outside them
    bucket = st._parse_partition_spec("bucket(16, doc_id)")["py"]
    dropped = {bucket(v) for bs in assignments for v in bs}
    final = read_snapshot(spark, table)
    rows = final.select("doc_id", "lang").collect()
    assert all(bucket(r.doc_id) not in dropped for r in rows)
    src = en if not published else en.unionByName(
        docs.where(F.col("lang") == "de").select("doc_id", "lang", "n_chars")
    )
    expected = {
        (r.doc_id, r.lang)
        for r in src.select("doc_id", "lang").collect()
        if bucket(r.doc_id) not in dropped
    }
    assert {(r.doc_id, r.lang) for r in rows} == expected
    if not published:
        assert any(r[0] == "conflict" for r in results)


def _drop_worker_manifests(table, buckets, q):
    """A rebasing committer under manifest encoding: the child process
    lowers the roll threshold (fresh interpreter — module state is NOT
    inherited) so every commit it makes exercises carry-over + re-roll
    against whatever segments the other process just published."""
    try:
        from svdmovie_lens_parallel_apache_spark_spark.sources import (
            snapshot_table as _st,
        )

        _st._MANIFEST_INLINE_MAX = 2
        got = [
            _st.drop_partition(table, {"bucket(16, doc_id)": b})
            for b in buckets
        ]
        q.put(("ok", buckets, got))
    except Exception as e:
        q.put(("err", buckets, repr(e)))


def test_cross_process_races_under_manifest_encoding(spark, docs, tmp_path):
    """Manifest segmentation under PROCESS-granularity commit races:
    4 rebasing drop-partition committers (3 commits each) against a
    table whose shard list is segment-encoded (threshold 2). Every
    version must stay contiguous and parseable, every live snapshot's
    segment refs must resolve, losing attempts' orphaned segment files
    must sweep without touching live ones, and the final data must be
    exactly the undropped rows — no lost commits, no dangling refs."""
    import glob as _glob

    table = str(tmp_path / "t")
    en = docs.where(F.col("lang") == "en")
    old = st._MANIFEST_INLINE_MAX
    st._MANIFEST_INLINE_MAX = 2
    try:
        write_snapshot(en, table, partition_by=["bucket(16, doc_id)"])
    finally:
        st._MANIFEST_INLINE_MAX = old
    assert st._raw_snapshot(table, 1).get("manifests")  # encoded start
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    assignments = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)]
    procs = [
        ctx.Process(target=_drop_worker_manifests, args=(table, list(bs), q))
        for bs in assignments
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert not [r for r in results if r[0] == "err"], results
    assert latest_version(table) == 13
    hist = snapshot_history(table)  # resolves every version's segments
    assert [s["version"] for s in hist] == list(range(1, 14))
    # every live snapshot's refs resolve; orphaned segments sweep clean
    n_before = len(_glob.glob(os.path.join(table, "_manifests", "*.json")))
    st.vacuum(table)
    live = set()
    for v in range(1, 14):
        live |= set(st._raw_snapshot(table, v).get("manifests", []))
    left = {
        os.path.basename(p)
        for p in _glob.glob(os.path.join(table, "_manifests", "m-*.json"))
    }
    assert live <= left and len(left) <= n_before
    for name in live:
        st._load_manifest(table, name)  # parseable, present
    bucket = st._parse_partition_spec("bucket(16, doc_id)")["py"]
    dropped = {bucket(v) for bs in assignments for v in bs}
    rows = read_snapshot(spark, table).select("doc_id", "lang").collect()
    expected = {
        (r.doc_id, r.lang)
        for r in en.select("doc_id", "lang").collect()
        if bucket(r.doc_id) not in dropped
    }
    assert {(r.doc_id, r.lang) for r in rows} == expected
