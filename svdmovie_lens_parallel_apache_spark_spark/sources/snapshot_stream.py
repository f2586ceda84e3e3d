"""Snapshot table as a Structured Streaming SOURCE (Delta-style
``readStream`` over table commits).

The reference never streams (801-line batch RDD job); a 100 TB corpus
pipeline, however, is a CHAIN of tables — raw crawl -> filtered ->
deduped -> tokenized — and the thing that makes the chain incremental
is each table doubling as a streaming source for the next stage. This
module provides that over the snapshot-log format
(``sources/snapshot_table.py``) as a Spark 4 Python
``DataSourceStreamReader``:

- **Offsets are snapshot versions** (``{"version": N}``). ``latestOffset``
  reads the log's highest committed version; ``partitions(start, end)``
  resolves the files APPENDED in ``(start, end]`` purely from snapshot
  metadata (the :func:`~.snapshot_table.read_changes` walk: per append
  snapshot, its shard set minus its parent's). No pacing state exists
  outside the log + Spark's own offset checkpoint, so a restarted query
  is exactly-once BY CONSTRUCTION — replaying ``(start, end]`` always
  yields the same files, and a version is either wholly before or
  wholly after an offset. Contrast the synthetic source
  (``python_datasource.py``), which must re-sync in-memory pacing
  state on restart.
- **One input partition per appended file** — executor-side ``read``
  opens its parquet shard with pyarrow and yields Arrow RecordBatches
  (the zero-copy fast path) when the file's columns already match the
  scan schema, falling back to NULL-filled row tuples for shards
  written before a schema evolution widened the table.
- **Layout-only compactions in the range contribute nothing** (same
  rows, new files — skipped like an Iceberg replace snapshot).
  Row-changing commits (overwrite / delete / merge / rollback) FAIL the
  stream loudly: their effect is not representable as appended files,
  and silently skipping one would hand the consumer a wrong delta.
  Streaming consumers sit on append-mostly tables; after a rewrite,
  restart from a fresh ``start_version`` (or fall back to a batch
  rebuild) — the Delta/Iceberg operational rule, stated here instead of
  hidden.
- The scan schema is pinned at query start from the latest snapshot
  (schema evolution mid-stream needs a restart to surface new columns —
  same contract as Delta's streaming source).

Options: ``path`` (the table directory), ``start_version`` (default 0 =
from table creation, so version 1's files are the first batch), and
``partition_filter`` (JSON object ``{field: source_value_or_list}``,
fields of the table's partition spec with probes transformed like every
other surface) — each micro-batch then plans only the matching
partitions' added files from metadata alone, the streaming form of the
per-language derived-table refresh. Unstamped added shards are
conservatively kept.

Usage::

    register_snapshot_changes(spark)
    (spark.readStream.format("snapshot_changes")
        .option("path", table).option("start_version", 0).load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import StructType

from .snapshot_table import (
    _added_files,
    _load_snapshot,
    _partition_match,
    _transform_probes,
    latest_version,
)


def _build():
    """Class definitions deferred so importing this module never
    requires the pyspark.sql.datasource surface at import time."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    @dataclass
    class _Shard(InputPartition):
        path: str | None  # None = empty-range sentinel (yields nothing)

    class SnapshotChangesStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.table = options.get("path")
            if not self.table:
                raise ValueError("snapshot_changes: option 'path' required")
            self.start_version = int(options.get("start_version", 0))
            v = latest_version(self.table)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_changes: {self.table} has no snapshots"
                )
            snap = _load_snapshot(self.table, v)
            self.schema_json = snap["schema"]
            self.probes = None
            raw = options.get("partition_filter")
            if raw:
                import json as _json

                pb = snap.get("partition_by", [])
                self.probes = {
                    key: _transform_probes(pb, key, want)
                    for key, want in _json.loads(raw).items()
                }
            self.field_names = [
                f.name for f in StructType.fromJson(self.schema_json).fields
            ]

        def initialOffset(self):
            return {"version": self.start_version}

        def latestOffset(self):
            v = latest_version(self.table)
            return {"version": self.start_version if v is None else v}

        def partitions(self, start, end):
            entries, _ = _added_files(
                self.table, start["version"], end["version"]
            )
            if self.probes:
                entries = [
                    s
                    for s in entries
                    if all(
                        _partition_match(s, k, t)
                        for k, t in self.probes.items()
                    )
                ]
            import os

            data = os.path.join(self.table, "data")
            return [
                _Shard(os.path.join(data, s["file"])) for s in entries
            ] or [_Shard(None)]

        def read(self, partition):
            if partition.path is None:
                return
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(partition.path)
            if list(t.schema.names) != self.field_names:
                # pre-evolution shard: conform by name IN ARROW —
                # NULL-typed columns appended for missing fields, same
                # zero-copy batch path as the unevolved case (no
                # per-row Python materialisation)
                from pyspark.sql.pandas.types import to_arrow_type

                present = set(t.schema.names)
                fields = StructType.fromJson(self.schema_json).fields
                t = pa.table(
                    {
                        f.name: (
                            t[f.name]
                            if f.name in present
                            else pa.nulls(len(t), type=to_arrow_type(f.dataType))
                        )
                        for f in fields
                    }
                )
            yield from t.to_batches()

        def commit(self, end):
            pass  # the snapshot log + Spark's offset log are the state

    class SnapshotChangesDataSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_changes"

        def schema(self):
            table = self.options.get("path")
            if not table:
                raise ValueError("snapshot_changes: option 'path' required")
            v = latest_version(table)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_changes: {table} has no snapshots"
                )
            return StructType.fromJson(_load_snapshot(table, v)["schema"])

        def streamReader(self, schema):
            return SnapshotChangesStreamReader(self.options)

    return SnapshotChangesDataSource


def register_snapshot_changes(spark) -> None:
    """Idempotent registration of the ``snapshot_changes`` stream format."""
    spark.dataSource.register(_build())
