"""Fault injection for the two-phase tsv_shards sink: a REAL task retry
(not just abort) must leave exactly one published shard per partition
and bit-exact data — proving "a failed/speculative attempt's output is
never visible" under the scheduler's actual retry machinery.

Runs in a subprocess because task retries in local mode require the
``local[N, maxFailures]`` master form, which the shared test session
doesn't use (its context is created once with maxFailures=1).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import glob, json, os, sys

sys.path.insert(0, "@@REPO@@")
from svdmovie_lens_parallel_apache_spark_spark import get_spark
from svdmovie_lens_parallel_apache_spark_spark.sources.python_datasink import (
    register_tsv_shards,
)

target = sys.argv[1]
attempt_log = sys.argv[2]

# local[2, 3]: 2 threads, up to 3 attempts per task -> attempt-0 failures
# are retried by the real scheduler instead of failing the job
spark = get_spark(
    app_name="svdml-sink-fault", master="local[2,3]", shuffle_partitions=4
)
spark.sparkContext.setLogLevel("ERROR")
register_tsv_shards(spark)

df = spark.range(0, 100, 1, 4).selectExpr(
    "id", "concat('v', CAST(id AS STRING)) AS s"
)
(
    df.write.format("tsv_shards")
    .option("path", target)
    .option("fail_attempt0_on_value", "v37")  # first attempt of one task dies
    .option("attempt_log", attempt_log)
    .mode("append")
    .save()
)

manifest = json.load(open(os.path.join(target, "_MANIFEST.json")))
published = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(target, "part-*.tsv"))
)
rows = []
for p in published:
    with open(os.path.join(target, p)) as f:
        rows += [line.rstrip("\n").split("\t") for line in f]
print(
    "RESULT "
    + json.dumps(
        {
            "n_shards": manifest["n_shards"],
            "manifest_rows": manifest["n_rows"],
            "manifest_files": sorted(s["file"] for s in manifest["shards"]),
            "published": published,
            "ids": sorted(int(r[0]) for r in rows),
            "tmp_leftover": glob.glob(os.path.join(target, "_tmp", "*", "*")),
        }
    )
)
spark.stop()
"""


def test_task_retry_never_publishes_failed_attempt(tmp_path):
    target = str(tmp_path / "sink")
    attempt_log = str(tmp_path / "attempts.log")
    script = tmp_path / "job.py"
    script.write_text(_SCRIPT.replace("@@REPO@@", REPO))
    proc = subprocess.run(
        [sys.executable, str(script), target, attempt_log],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, proc.stdout
    res = json.loads(line[0][len("RESULT "):])

    # a real retry ran: attempt 0 logged (and failed), attempt 1 logged
    attempts = [int(x) for x in open(attempt_log).read().split()]
    assert 0 in attempts and max(attempts) >= 1, attempts

    # exactly one shard per input partition — the failed attempt's file
    # was never published and its temp dir is gone
    assert res["n_shards"] == 4
    assert res["manifest_files"] == res["published"]
    assert res["tmp_leftover"] == []

    # bit-exact data: all 100 ids exactly once (no loss, no duplication)
    assert res["manifest_rows"] == 100
    assert res["ids"] == list(range(100))


_SNAP_SCRIPT = r"""
import glob, json, os, sys

sys.path.insert(0, "@@REPO@@")
from svdmovie_lens_parallel_apache_spark_spark import get_spark
from svdmovie_lens_parallel_apache_spark_spark.sources.snapshot_datasource import (
    register_snapshot_table_source,
)
from svdmovie_lens_parallel_apache_spark_spark.sources.snapshot_table import (
    snapshot_history, vacuum,
)

table = sys.argv[1]

spark = get_spark(
    app_name="svdml-snap-fault", master="local[2,3]", shuffle_partitions=4
)
spark.sparkContext.setLogLevel("ERROR")
register_snapshot_table_source(spark)

df = spark.range(0, 100, 1, 4).selectExpr(
    "id", "CAST(id % 5 AS STRING) AS bucket5"
)
(
    df.write.format("snapshot_table")
    .option("partition_by", "bucket5")
    .option("fail_attempt0_on_value", "37")  # dies AFTER staging, once
    .mode("append")
    .save(table)
)
snap = snapshot_history(table)[-1]
got = sorted(
    tuple(r)
    for r in spark.read.format("snapshot_table")
    .option("path", table).load().collect()
)
expect = sorted((i, str(i % 5)) for i in range(100))
residue = glob.glob(os.path.join(table, "_tmp", "batch", "*.parquet"))
swept = vacuum(table, stage_older_than=0)
per_tuple = {}
for s in snap["shards"]:
    per_tuple.setdefault(s["partition"]["bucket5"], 0)
    per_tuple[s["partition"]["bucket5"]] += s["n_rows"]
print(
    "RESULT "
    + json.dumps(
        {
            "data_ok": got == expect,
            "n_rows": snap["n_rows"],
            "tuples": per_tuple,
            "residue_before_sweep": len(residue),
            "staged_pruned": swept.get("staged_removed", 0),
            "stamped": all("partition" in s for s in snap["shards"]),
        }
    )
)
spark.stop()
"""


def test_snapshot_writer_partitioned_task_retry(tmp_path):
    """A REAL task retry through the partitioned official writer: the
    first attempt dies AFTER staging its per-tuple files, the scheduler
    retries, and the commit publishes exactly the retry's shards — the
    failed attempt's staged files stay invisible residue until vacuum's
    staged-age sweep. Data bit-exact, every shard stamped."""
    table = str(tmp_path / "t")
    script = _SNAP_SCRIPT.replace("@@REPO@@", REPO)
    proc = subprocess.run(
        [sys.executable, "-c", script, table],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    ][-1]
    got = json.loads(line[len("RESULT "):])
    assert got["data_ok"], got
    assert got["n_rows"] == 100
    assert got["stamped"]
    assert sum(got["tuples"].values()) == 100
    # the dead attempt staged real files; they never became visible
    assert got["residue_before_sweep"] >= 1
    assert got["staged_pruned"] >= got["residue_before_sweep"]
