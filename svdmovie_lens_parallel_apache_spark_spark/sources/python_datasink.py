"""Custom Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource``).

Sink-side counterpart of ``python_datasource.py``: the reference's sink
is a driver-adjacent text dump (``SVDMovieLensSparkJava.java:469``
``saveAsTextFile``); ``sources/writers.py`` covers the built-in TSV /
parquet sinks. This module exercises the sink EXTENSION POINT — the API
an engine needs for destinations Spark has no connector for (internal
services, bespoke shard layouts) — with the two-phase commit protocol
that makes a distributed write exactly-once:

- each task writes its partition to a private ``_tmp/`` file and returns
  a :class:`WriterCommitMessage` (path + row count) — nothing a failed
  or speculatively-retried task wrote is ever visible;
- ``commit`` (driver, after ALL tasks succeed) atomically publishes the
  temp files (``os.replace``) and writes a ``_MANIFEST.json`` naming
  every shard and its row count — readers treat the manifest as the
  commit record (the _SUCCESS-marker discipline);
- ``abort`` removes the orphaned temp files, so a failed job leaves the
  target directory exactly as it found it.

Shards are TSV (no header), matching the reference's sink shape; text
columns must be tab/newline-free (true for every fixture and for the
synthetic corpus — asserted per row rather than silently corrupted).

Semantics per save mode: ``append`` publishes new shards and MERGES the
manifest with any existing one (prior data stays visible); ``overwrite``
publishes, then removes every previously-manifested shard and writes a
manifest naming only this job's shards. Temp shards live under a
per-JOB ``_tmp/<job-id>/`` subdir, so concurrent jobs on the same path
never touch each other's in-flight files (last manifest still wins —
concurrent commits to one path need a table format, not a file sink).

Scope note: the local publish step (driver-side ``os.replace``) assumes
driver and executors share one filesystem — true for local[...] and any
POSIX shared mount. On an object store there is no rename: tasks write
straight to unique final keys and ``commit`` publishes by writing the
manifest alone (readers trust only manifested shards). The two-phase
protocol — private task output, manifest as the commit record, abort
cleans temp — is the part that transfers unchanged.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass


def _build():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _ShardDone(WriterCommitMessage):
        tmp_path: str
        filename: str
        n_rows: int

    class TsvShardsWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("tsv_shards sink requires a path")
            self.overwrite = overwrite
            self.fail_on_value = options.get("fail_on_value")  # test hook
            # transient-failure test hook: fail only attempt 0 of the
            # task holding this value, so a real Spark task RETRY (not
            # abort) exercises the two-phase protocol; attempts are
            # recorded to attempt_log so the test can prove a retry ran
            self.fail_attempt0_on_value = options.get("fail_attempt0_on_value")
            self.attempt_log = options.get("attempt_log")
            # per-JOB temp namespace: the writer is constructed once on
            # the driver and pickled to every task, so this id is shared
            # by the job's tasks and by commit/abort — and by nobody else
            self.job_id = uuid.uuid4().hex

        def write(self, iterator):
            # executor-side: private temp shard; never visible to readers
            tmp_dir = os.path.join(self.path, "_tmp", self.job_id)
            os.makedirs(tmp_dir, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.tsv"
            tmp = os.path.join(tmp_dir, name)
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    vals = [
                        "" if v is None else str(v) for v in row
                    ]
                    for v in vals:
                        if "\t" in v or "\n" in v:
                            raise ValueError(
                                "tsv_shards: value contains tab/newline"
                            )
                        if self.fail_on_value is not None and v == self.fail_on_value:
                            raise RuntimeError(
                                f"injected task failure on {v!r}"
                            )
                        if (
                            self.fail_attempt0_on_value is not None
                            and v == self.fail_attempt0_on_value
                        ):
                            from pyspark import TaskContext

                            att = TaskContext.get().attemptNumber()
                            if self.attempt_log:
                                with open(self.attempt_log, "a") as lf:
                                    lf.write(f"{att}\n")
                            if att == 0:
                                raise RuntimeError(
                                    f"injected TRANSIENT failure on {v!r} "
                                    f"(attempt {att})"
                                )
                    f.write("\t".join(vals) + "\n")
                    n += 1
            return _ShardDone(tmp_path=tmp, filename=name, n_rows=n)

        def commit(self, messages):
            manifest_path = os.path.join(self.path, "_MANIFEST.json")
            prior = []
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    prior = json.load(f)["shards"]
            shards = [] if self.overwrite else list(prior)
            for m in messages:
                if m is None:
                    continue
                final = os.path.join(self.path, m.filename)
                os.replace(m.tmp_path, final)  # atomic publish
                shards.append({"file": m.filename, "n_rows": m.n_rows})
            manifest = {
                "format": "tsv",
                "n_shards": len(shards),
                "n_rows": sum(s["n_rows"] for s in shards),
                "shards": sorted(shards, key=lambda s: s["file"]),
            }
            # the manifest IS the commit record, so its swap must be
            # atomic and must land BEFORE any old shard is retired: a
            # crash then leaves either the old manifest (every file it
            # names still exists) or the new one (retired shards become
            # unreferenced orphans, never dangling references)
            tmp_manifest = os.path.join(
                self.path, "_tmp", self.job_id, "_MANIFEST.json"
            )
            os.makedirs(os.path.dirname(tmp_manifest), exist_ok=True)
            with open(tmp_manifest, "w") as f:
                json.dump(manifest, f, indent=1, sort_keys=True)
            os.replace(tmp_manifest, manifest_path)
            if self.overwrite:
                # retire everything the PREVIOUS manifest published
                # (uuid names never collide, so no zero-data window)
                mine = {s["file"] for s in shards}
                for s in prior:
                    if s["file"] not in mine:
                        try:
                            os.remove(os.path.join(self.path, s["file"]))
                        except FileNotFoundError:
                            pass
            self._cleanup_tmp()

        def abort(self, messages):
            self._cleanup_tmp()

        def _cleanup_tmp(self):
            # anything still under THIS JOB's _tmp/<job-id>/ is
            # uncommitted by definition: shards from FAILED tasks (no
            # commit message ever returned) and speculative/retried
            # duplicates — published files were already os.replace'd out.
            # Other jobs' temp namespaces are left alone.
            import shutil

            tmp_dir = os.path.join(self.path, "_tmp", self.job_id)
            shutil.rmtree(tmp_dir, ignore_errors=True)
            root = os.path.join(self.path, "_tmp")
            try:
                if os.path.isdir(root) and not os.listdir(root):
                    os.rmdir(root)
            except OSError:
                pass

    class TsvShardsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "tsv_shards"

        def writer(self, schema, overwrite):
            return TsvShardsWriter(self.options, overwrite)

    return TsvShardsDataSource


def register_tsv_shards(spark) -> None:
    """Idempotent registration of the ``tsv_shards`` sink format."""
    spark.dataSource.register(_build())
