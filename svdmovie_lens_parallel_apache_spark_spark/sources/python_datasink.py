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

        def write(self, iterator):
            # executor-side: private temp shard; never visible to readers
            tmp_dir = os.path.join(self.path, "_tmp")
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
                    f.write("\t".join(vals) + "\n")
                    n += 1
            return _ShardDone(tmp_path=tmp, filename=name, n_rows=n)

        def commit(self, messages):
            shards = []
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
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f, indent=1, sort_keys=True)
            self._cleanup_tmp()

        def abort(self, messages):
            self._cleanup_tmp()

        def _cleanup_tmp(self):
            # anything still under _tmp/ is uncommitted by definition:
            # shards from FAILED tasks (no commit message ever returned)
            # and from speculative/retried duplicates — published files
            # were already os.replace'd into the parent
            import shutil

            tmp_dir = os.path.join(self.path, "_tmp")
            shutil.rmtree(tmp_dir, ignore_errors=True)

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
