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
from table creation, so version 1's files are the first batch),
``partition_filter`` (JSON object ``{field: source_value_or_list}``,
fields of the table's partition spec with probes transformed like every
other surface) — each micro-batch then plans only the matching
partitions' added files from metadata alone, the streaming form of the
per-language derived-table refresh (unstamped added shards are
conservatively kept) — and ``max_files_per_trigger`` (admission
control, Delta's option of the same name): each micro-batch admits
whole commits until their cumulative file count would exceed the
budget, so a consumer of a hot table paces itself instead of planning
one monster batch after downtime. For THIS append-level source the
budget is file-granular: offsets become ``{"version": V, "index": I}``
(first I adds of V consumed, legacy whole-version offsets normalize
seamlessly) and a single commit larger than the budget — including a
fresh subscription's initial 100 TB snapshot — pages through in
budget-sized batches, Delta's (version, index) idiom. The row-level
``snapshot_cdc`` source keeps WHOLE-commit granularity instead: its
apply-sink reduces each batch per key by highest version, and
splitting a version's delete/insert pairs across batches would make
replica convergence order-sensitive. CAVEAT: with
``availableNow`` Spark captures ONE capped end offset per invocation,
so the budget becomes a per-RUN budget (the drain advances at most
budget files, re-invoke to catch up — Delta's historical Trigger.Once
behavior); continuous triggers (``processingTime``) pace per trigger
as expected. The cap counts a commit's files before any
``partition_filter`` pruning.

Usage::

    register_snapshot_changes(spark)
    (spark.readStream.format("snapshot_changes")
        .option("path", table).option("start_version", 0).load())

A second format, ``snapshot_cdc`` (Delta ``readChangeFeed`` streaming
/ Iceberg changelog scan shaped), is the ROW-LEVEL twin: it streams
every change as table rows + ``_change_type`` ('insert' | 'delete') +
``_commit_version``, and — unlike the append-only format — passes
through the commits row-level DML produces (MoR merge/update deletion
vectors, pure file removals like ``drop_partition``), so a table fed
by ``streaming_merge_sink`` can itself be subscribed to: the
table→table CDC pipeline with updates, end to end, no version
polling. Commit shapes whose changes are not exactly attributable to
single files (CoW rewrites, condition tombstones, rename/drop
crossings) fail loudly — fall back to batch ``read_cdc`` or restart
past them (see :func:`_cdc_plan_version`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import StructType

from .snapshot_table import (
    _added_files,
    _load_snapshot,
    _partition_match,
    _transform_probes,
    _version_change_counts,
    latest_version,
)


def _capped_latest(latest: int, pos: int | None, budget: int, count_of) -> int:
    """Admission control (Delta ``maxFilesPerTrigger`` shaped) at
    VERSION granularity: the largest end version whose cumulative
    per-commit item count from ``pos`` stays within ``budget`` — always
    at least one version, so a single commit larger than the budget
    still ships whole (commits are never split across micro-batches:
    the CDC apply sink's highest-version-wins reduction and the
    append stream's per-commit atomicity both rely on a version being
    wholly inside one batch, the same reason Delta's option admits at
    minimum one file).

    ``pos`` is the reader's planning high-water, learned from
    ``partitions``/``commit`` calls and seeded with ``start_version`` —
    the Python stream-reader API hands ``latestOffset`` no start
    offset, so after a RESTART from a checkpoint ahead of
    start_version the first capped offset can land behind the
    checkpoint. That costs one empty micro-batch (the (checkpoint,
    behind] range plans nothing) and teaches the reader the true
    position; the delivered-floor clamp in ``partitions`` makes the
    recovery duplicate-free when Spark's offset log then steps back
    through the regressed entry. Steady-state triggers pace exactly."""
    if pos is None or latest <= pos:
        return latest
    total, v = 0, pos
    while v < latest:
        c = count_of(v + 1)
        if total and total + c > budget:
            break
        total += c
        v += 1
    return v


def _norm_off(off: dict) -> tuple[int, int]:
    """Canonical position of a snapshot_changes offset: ``(V, I)`` =
    every add of versions < V consumed, plus the first I adds (sorted
    file-name order) of version V. The legacy whole-version form
    ``{"version": V}`` (no index) means consumed THROUGH V, i.e.
    ``(V + 1, 0)`` — so pre-split checkpoints resume seamlessly."""
    if "index" in off:
        return (off["version"], off["index"])
    return (off["version"] + 1, 0)


def _capped_end_indexed(
    table: str, latest: int, pos: tuple[int, int], budget: int,
) -> tuple[int, int]:
    """File-granular admission control for the APPEND stream (Delta
    maxFilesPerTrigger with (version, index) offsets): advance from
    ``pos`` accumulating per-version add counts, splitting INSIDE the
    version that would blow the budget — so a fresh subscription to a
    100 TB table pages through its initial snapshot in budget-sized
    batches instead of one monster batch. Always admits at least one
    file. Counts come from the raw segment diff; a layout rewrite
    (compaction) can over-count there, which at worst burns budget on
    a version the planner slices to nothing — never loss, never
    duplication (the slice is over the TRUE sorted add list, and a
    slice past its end is empty)."""
    v, i = pos
    total = 0
    while v <= latest:
        n = _version_change_counts(table, v)[0]
        avail = max(0, n - i)
        if total + avail > budget:  # this version overflows the budget
            take = budget - total
            if take <= 0 and total > 0:
                return (v, i)  # stop at the version boundary
            return (v, i + max(take, 1))  # ≥1 file: always progress
        total += avail
        v += 1
        i = 0
    return (v, 0)  # == (latest + 1, 0): fully caught up


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
            self.max_files = int(options.get("max_files_per_trigger", 0) or 0)
            # positions are (version, index) tuples — see _norm_off
            self._pos = (self.start_version + 1, 0)  # planning high-water
            self._floor = (self.start_version + 1, 0)  # delivered floor

        def initialOffset(self):
            return {"version": self.start_version}

        def latestOffset(self):
            v = latest_version(self.table)
            if v is None:
                return {"version": self.start_version}
            if self.max_files:
                ev, ei = _capped_end_indexed(
                    self.table, v, max(self._pos, self._floor),
                    self.max_files,
                )
                # canonical indexed form; equals the committed offset
                # dict byte-for-byte once caught up (no churn batches)
                return {"version": ev, "index": ei}
            return {"version": v}

        def partitions(self, start, end):
            # delivered floor: a batch STARTING at position p proves
            # everything before p was already delivered (Spark's offset
            # log says so) — clamping below makes a post-restart offset
            # regression replay-free; in monotone flow, the identity
            s = max(_norm_off(start), self._floor)
            e = _norm_off(end)
            self._floor = s
            self._pos = max(self._pos, s, e)
            entries = []
            v, i = s
            while (v, i) < e:
                if v == e[0] and e[1] == 0:
                    break  # (V, 0) references nothing of V
                adds, _ = _added_files(self.table, v - 1, v)
                hi = e[1] if v == e[0] else len(adds)
                entries.extend(adds[i:hi])
                v, i = v + 1, 0
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
            # pre-evolution shards conform by name IN ARROW (NULL-fill
            # missing, drop extra) — shared with the CDC reader
            t = _conform_arrow(
                t, StructType.fromJson(self.schema_json).fields, None
            )
            yield from t.to_batches()

        def commit(self, end):
            # the snapshot log + Spark's offset log are the state; the
            # position hints only pace the NEXT latestOffset and floor
            self._pos = max(self._pos, _norm_off(end))
            self._floor = max(self._floor, _norm_off(end))

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


def _conform_arrow(t, fields, names: dict | None):
    """Conform a pyarrow table to the stream's pinned logical
    ``fields`` — the executor-side twin of the driver's
    ``_read_shards`` column-mapping read: with a shard mapping
    (logical → physical, stamped by rename/drop), each logical column
    reads its PHYSICAL bytes and an unmapped logical name reads NULL
    (never a same-named physical column — the name-reuse trap);
    without one, match by name, NULL-filling absences. Extra physical
    columns (added after the stream pinned its schema) drop until the
    consumer restarts — Delta's streaming evolution contract. Pure
    Arrow column shuffling: zero-copy for present columns."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    if names is None and list(t.schema.names) == [f.name for f in fields]:
        return t
    present = set(t.schema.names)

    def col(f):
        physical = names.get(f.name) if names is not None else f.name
        if physical is not None and physical in present:
            return t[physical]
        return pa.nulls(len(t), type=to_arrow_type(f.dataType))

    return pa.table({f.name: col(f) for f in fields})


def _cdc_plan_version(table: str, v: int) -> list[dict]:
    """Plan one committed version's row-level changes as PER-FILE work
    items (the streaming twin of ``read_cdc``'s visibility diff, with
    the diff restricted to the commit shapes whose changes are exactly
    attributable to single files — so executors never need a
    cross-file ``exceptAll``):

    - row-preserving commits (metadata, add_column, spec evolution,
      layout/materialising compaction) plan nothing;
    - pure appends (and MoR merge/update inserts) plan one INSERT item
      per added file;
    - a commit's NEW positional vectors plan one DELETE_COORDS item
      per covered file — the pre-images are the rows at the vector's
      coordinates, which the stack-over-visible-rows invariant
      guarantees were visible in the parent (never double-deleted);
    - pure removals (drop_partition, whole-file deletes) plan one
      DELETE_FILE item per removed file — its visible rows (all rows
      minus the parent's positional coordinates) are the pre-images.

    Anything else raises loudly: a CoW rewrite (adds AND removes
    files) re-writes unchanged rows, so per-file attribution would
    fabricate delete+insert churn the batch diff cancels; a condition
    tombstone needs driver-side SQL evaluation; rename/drop crossing
    the range changes names mid-feed. Those ranges restart from a
    fresh ``start_version`` or fall back to batch :func:`~.
    snapshot_table.read_cdc` — stated, never silently skipped."""
    import os

    from .snapshot_table import _DATA_DIR, _dv_parts

    snap = _load_snapshot(table, v)
    op = snap["operation"]
    if op in ("rename_column", "drop_column"):
        raise ValueError(
            f"snapshot_cdc: version {v} is a {op} commit; frames before "
            f"and after it disagree on column names — restart the feed "
            f"at or after it"
        )
    parent = (
        _load_snapshot(table, v - 1) if v > 1 else {"shards": []}
    )
    if snap.get("properties", {}).get("compaction"):
        # layout rewrite; a materialising compaction applies pending
        # tombstones INTO files, so visible rows are identical too
        return []
    old = {s["file"]: s for s in parent["shards"]}
    new = {s["file"]: s for s in snap["shards"]}
    added = [s for f, s in sorted(new.items()) if f not in old]
    removed = [s for f, s in sorted(old.items()) if f not in new]
    old_dels = parent.get("deletes", [])
    new_dels = snap.get("deletes", [])
    if new_dels[: len(old_dels)] != old_dels:
        raise ValueError(
            f"snapshot_cdc: version {v} ({op}) rewrites the parent's "
            f"tombstone set; not stream-representable — restart from a "
            f"fresh start_version or rebuild via batch read_cdc"
        )
    extra = new_dels[len(old_dels):]
    if any("condition" in d for d in extra):
        raise ValueError(
            f"snapshot_cdc: version {v} ({op}) adds a condition "
            f"tombstone (driver-side SQL); not stream-representable — "
            f"compact the table and restart the feed"
        )
    if added and removed:
        raise ValueError(
            f"snapshot_cdc: version {v} ({op}) is a copy-on-write "
            f"rewrite (adds and removes files); per-file attribution "
            f"would fabricate unchanged-row churn — restart from a "
            f"fresh start_version or rebuild via batch read_cdc"
        )
    data = os.path.join(table, _DATA_DIR)
    items: list[dict] = []
    # a vector committed WITH its covered file (one commit appending X
    # and a vector over X — publish_branch squashing a branch's append
    # + later MoR merge produces exactly this) means X's deleted rows
    # were never visible on this lineage: the file streams as INSERTS
    # of its visible rows (all minus the vector's coords) and emits no
    # deletes for them
    extra_cover: dict[str, list[str]] = {}
    for d in extra:
        for f in d["shards"]:
            extra_cover.setdefault(f, []).extend(
                os.path.join(data, p) for p in _dv_parts(d)
            )
    for s in added:
        items.append(
            {
                "kind": "insert",
                "data_path": os.path.join(data, s["file"]),
                "names": s.get("names"),
                "version": v,
                "dv_paths": extra_cover.get(s["file"], []),
                "file_name": s["file"],
            }
        )
    # positional parent tombstones per covered file (for removals)
    parent_cover: dict[str, list[str]] = {}
    has_parent_condition: dict[str, bool] = {}
    for d in old_dels:
        for f in d["shards"]:
            if "condition" in d:
                has_parent_condition[f] = True
            else:
                parent_cover.setdefault(f, []).extend(
                    os.path.join(data, p) for p in _dv_parts(d)
                )
    for d in extra:  # new vectors: pre-images at their coordinates
        paths = [os.path.join(data, p) for p in _dv_parts(d)]
        for f in d["shards"]:
            if f not in old:
                continue  # covered file added THIS commit: rows at the
                # coords were never visible — handled as insert-minus-
                # coords above, no delete pre-images exist
            items.append(
                {
                    "kind": "delete_coords",
                    "data_path": os.path.join(data, f),
                    "names": old[f].get("names"),
                    "version": v,
                    "dv_paths": paths,
                    "file_name": f,
                }
            )
    for s in removed:
        f = s["file"]
        if has_parent_condition.get(f):
            raise ValueError(
                f"snapshot_cdc: version {v} ({op}) removes file {f} "
                f"covered by a condition tombstone (driver-side SQL); "
                f"not stream-representable — compact first"
            )
        items.append(
            {
                "kind": "delete_file",
                "data_path": os.path.join(data, f),
                "names": s.get("names"),
                "version": v,
                "dv_paths": parent_cover.get(f, []),
                "file_name": f,
            }
        )
    return items


def _build_cdc():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    @dataclass
    class _Change(InputPartition):
        kind: str | None  # None = empty-range sentinel
        data_path: str = ""
        names: tuple | None = None  # shard column map, as sorted items
        version: int = 0
        dv_paths: tuple = ()
        file_name: str = ""

    class SnapshotCdcStreamReader(DataSourceStreamReader):
        """Change-data-feed STREAM over a snapshot table (Delta
        ``readChangeFeed`` streaming / Iceberg changelog-scan shaped):
        each micro-batch is the row-level changes of a committed
        version range, tagged ``_change_type`` ('insert' | 'delete')
        and ``_commit_version`` — so a downstream table can subscribe
        to an UPSTREAM table that takes row-level DML (the
        ``streaming_merge_sink`` CDC-apply loop), closing the
        table→table incremental pipeline without version polling.

        Offsets are snapshot versions; planning is a pure function of
        the log (``_cdc_plan_version``), so restarts are exactly-once
        by construction, same as ``snapshot_changes``. An update
        surfaces as its delete(pre-image) + insert(post-image) pair —
        note one divergence from batch ``read_cdc``'s multiset diff:
        an update writing values IDENTICAL to the old row emits the
        pair anyway (the batch diff cancels it), Delta CDF's behavior;
        net effect per key is identical for any consumer merging by
        key. The scan schema is pinned at query start; columns added
        mid-stream surface after a restart."""

        def __init__(self, options):
            self.table = options.get("path")
            if not self.table:
                raise ValueError("snapshot_cdc: option 'path' required")
            self.start_version = int(options.get("start_version", 0))
            v = latest_version(self.table)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_cdc: {self.table} has no snapshots"
                )
            self.schema_json = _load_snapshot(self.table, v)["schema"]
            self.max_files = int(options.get("max_files_per_trigger", 0) or 0)
            self._pos = self.start_version  # planning high-water
            self._floor = self.start_version  # delivered floor

        def initialOffset(self):
            return {"version": self.start_version}

        def latestOffset(self):
            v = latest_version(self.table)
            if v is None:
                return {"version": self.start_version}
            if self.max_files:
                v = _capped_latest(
                    v, self._pos, self.max_files,
                    # raw segment-diff counts: adds + removals + DV-
                    # covered files ~= the planned change items, in
                    # O(changed metadata); refusal shapes still fail
                    # loudly in the planning walk
                    lambda u: sum(_version_change_counts(self.table, u)),
                )
            return {"version": v}

        def partitions(self, start, end):
            # same delivered-floor clamp as snapshot_changes (see there)
            lo = max(start["version"], self._floor)
            self._floor = lo
            self._pos = max(self._pos, lo, end["version"])
            items = []
            for v in range(lo + 1, end["version"] + 1):
                items.extend(_cdc_plan_version(self.table, v))
            return [
                _Change(
                    kind=i["kind"],
                    data_path=i["data_path"],
                    names=(
                        tuple(sorted(i["names"].items()))
                        if i["names"] is not None else None
                    ),
                    version=i["version"],
                    dv_paths=tuple(i["dv_paths"]),
                    file_name=i["file_name"],
                )
                for i in items
            ] or [_Change(kind=None)]

        def read(self, partition):
            if partition.kind is None:
                return
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(partition.data_path)
            if partition.dv_paths:
                pos: list[int] = []
                for p in partition.dv_paths:
                    dv = pq.read_table(
                        p, filters=[("file", "=", partition.file_name)]
                    )
                    pos.extend(dv.column("pos").to_pylist())
                if partition.kind == "delete_coords":
                    # pre-images AT the new vector's coordinates
                    t = t.take(pa.array(sorted(pos), type=pa.int64()))
                else:
                    # visible rows = all minus the coords: delete_file
                    # (parent vectors) and same-commit-covered inserts
                    mask = np.ones(len(t), dtype=bool)
                    if pos:
                        mask[np.asarray(pos, dtype=np.int64)] = False
                    t = t.filter(pa.array(mask))
            fields = StructType.fromJson(self.schema_json).fields
            t = _conform_arrow(
                t, fields,
                dict(partition.names) if partition.names is not None
                else None,
            )
            kind = "insert" if partition.kind == "insert" else "delete"
            t = t.append_column(
                "_change_type", pa.array([kind] * len(t), type=pa.string())
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * len(t), type=pa.int64()),
            )
            yield from t.to_batches()

        def commit(self, end):
            # the snapshot log + Spark's offset log are the state; the
            # position hints only pace the NEXT latestOffset and floor
            self._pos = max(self._pos, end["version"])
            self._floor = max(self._floor, end["version"])

    class SnapshotCdcDataSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_cdc"

        def schema(self):
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            table = self.options.get("path")
            if not table:
                raise ValueError("snapshot_cdc: option 'path' required")
            v = latest_version(table)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_cdc: {table} has no snapshots"
                )
            base = StructType.fromJson(_load_snapshot(table, v)["schema"])
            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )

        def streamReader(self, schema):
            return SnapshotCdcStreamReader(self.options)

    return SnapshotCdcDataSource


def register_snapshot_cdc(spark) -> None:
    """Idempotent registration of the ``snapshot_cdc`` stream format."""
    spark.dataSource.register(_build_cdc())
