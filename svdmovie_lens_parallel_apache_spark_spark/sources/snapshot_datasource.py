"""Snapshot table as an official Spark 4 Python DataSource (read path).

``spark.read.format("snapshot_table").option("path", t).load()`` gives
the snapshot-log table (``snapshot_table.py``) a STANDARD read surface
— and, more importantly, wires Catalyst's pushed filters into the
table's OWN metadata skipping: ``pushFilters`` receives the
planner-pushed predicates, narrows a per-column interval (plus bloom
point probes for equalities), and ``partitions()`` plans one input
partition per SURVIVING shard — stats-disjoint and bloom-excluded
shards never become tasks, never open a footer. That is the
Iceberg/Delta integration shape: the optimizer's predicates reach the
table format's file-skipping layer with no manual ``prune=`` argument.

Correctness never depends on the skipping: every filter is yielded
back to Spark as unhandled (skipping is a scan reducer; Spark still
applies the row filters), and a shard is only dropped when its
recorded stats/bloom PROVABLY exclude every matching row — the same
contract as ``read_snapshot(prune=...)``.

Executor-side reads go through pyarrow and are column-mapping aware
(``names`` stamped by rename/drop evolution): mapped shards read
their physical columns and alias back; logical columns a shard lacks
are NULL-filled — bit-identical semantics to ``_read_shards``. Each
partition yields Arrow record batches (the zero-copy path into
Spark's Python source exec).

Boundaries (loud, never silent): tables with pending lazy-delete
tombstones refuse (their SQL conditions cannot be evaluated inside an
Arrow reader — compact first); ``version`` / ``as_of`` options give
time travel; an empty table errors at ``schema()`` time.

The ``plan_log`` option (a file path) records ``{"planned": n,
"total": m}`` at planning time — the oracle gate's proof that pushdown
actually changed what was PLANNED, not just what was returned.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


def _build():
    """Deferred class definitions (importing this module never requires
    a live Spark — same gating convention as python_datasource.py)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        In,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    from .snapshot_table import (
        _DATA_DIR,
        _bloom_may_contain,
        _load_snapshot,
        latest_version,
        version_as_of,
    )

    @dataclass
    class _Shard(InputPartition):
        path: str | None  # None = the empty-table placeholder
        names: dict | None  # logical -> physical column mapping

    def _resolve(options) -> dict:
        table = options.get("path")
        if not table:
            raise ValueError(
                "snapshot_table source: option 'path' is required"
            )
        if options.get("version") is not None and options.get(
            "as_of"
        ) is not None:
            raise ValueError(
                "snapshot_table source: version and as_of are mutually "
                "exclusive"
            )
        if options.get("as_of") is not None:
            v = version_as_of(table, float(options["as_of"]))
        elif options.get("version") is not None:
            v = int(options["version"])
        else:
            v = latest_version(table)
            if v is None:
                raise FileNotFoundError(
                    f"snapshot_table source: {table} has no snapshots"
                )
        snap = _load_snapshot(table, v)
        if snap.get("deletes"):
            raise ValueError(
                "snapshot_table source: pending lazy deletes cannot be "
                "applied inside the Arrow reader; run compact_table "
                "first (or read via read_snapshot)"
            )
        return snap

    class SnapshotTableReader(DataSourceReader):
        def __init__(self, options, schema: StructType):
            self.options = options
            self.table = options["path"]
            self.snap = _resolve(options)
            self.schema = schema
            # narrowed per-column intervals from pushed filters:
            # col -> [lo, hi] with None = unbounded on that side
            self.bounds: dict[str, list] = {}
            self.points: dict[str, object] = {}  # equality probes
            # IN-list filters: each is (col, values); a shard survives
            # one iff AT LEAST one value can be present in it
            self.any_of: list[tuple[str, tuple]] = []

        def _narrow(self, col: str, lo=None, hi=None):
            b = self.bounds.setdefault(col, [None, None])
            if lo is not None and (b[0] is None or lo > b[0]):
                b[0] = lo
            if hi is not None and (b[1] is None or hi < b[1]):
                b[1] = hi

        def pushFilters(self, filters):
            # supported comparison shapes narrow the skip interval;
            # EVERY filter is yielded back unhandled — skipping is a
            # scan reducer, Spark keeps the row-level Filter node
            for f in filters:
                attr = getattr(f, "attribute", None)
                value = getattr(f, "value", None)
                kind = type(f).__name__
                if (
                    isinstance(f, In)
                    and attr is not None
                    and len(attr) == 1
                    and value
                    and all(isinstance(v, (int, float, str)) for v in value)
                ):
                    # multi-point lookup: stats + bloom per listed value
                    self.any_of.append((attr[0], tuple(value)))
                elif (
                    attr is not None
                    and len(attr) == 1
                    and value is not None
                    and isinstance(value, (int, float, str))
                ):
                    col = attr[0]
                    if isinstance(f, EqualTo):
                        self._narrow(col, lo=value, hi=value)
                        self.points[col] = value
                    elif kind in ("GreaterThan", "GreaterThanOrEqual"):
                        # inclusive bound is conservative for the strict
                        # form: a boundary shard survives, never skipped
                        self._narrow(col, lo=value)
                    elif kind in ("LessThan", "LessThanOrEqual"):
                        self._narrow(col, hi=value)
                yield f

        @staticmethod
        def _stats_allow(s: dict, col: str, lo, hi) -> bool:
            """Type-safe one-sided variant of _stats_overlap: None =
            unbounded side; incomparable types (a filter whose value
            type differs from the recorded stats) conservatively keep
            the shard — skipping must be PROVABLE."""
            b = s.get("stats", {}).get(col)
            if b is None or b[0] is None or b[1] is None:
                return True
            try:
                if lo is not None and b[1] < lo:
                    return False
                if hi is not None and b[0] > hi:
                    return False
            except TypeError:
                return True
            return True

        def _surviving(self) -> list[dict]:
            shards = self.snap["shards"]
            for col, (lo, hi) in self.bounds.items():
                shards = [
                    s for s in shards if self._stats_allow(s, col, lo, hi)
                ]
            for col, value in self.points.items():
                shards = [
                    s for s in shards if _bloom_may_contain(s, col, value)
                ]
            for col, values in self.any_of:
                shards = [
                    s
                    for s in shards
                    if any(
                        self._stats_allow(s, col, v, v)
                        and _bloom_may_contain(s, col, v)
                        for v in values
                    )
                ]
            return shards

        def partitions(self):
            live = self._surviving()
            log = self.options.get("plan_log")
            if log:
                with open(log, "w") as fh:
                    json.dump(
                        {
                            "planned": len(live),
                            "total": len(self.snap["shards"]),
                        },
                        fh,
                    )
            if not live:
                return [_Shard(None, None)]
            return [
                _Shard(
                    os.path.join(self.table, _DATA_DIR, s["file"]),
                    s.get("names"),
                )
                for s in live
            ]

        def read(self, partition):
            if partition.path is None:
                return
            import pyarrow as pa
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import to_arrow_schema

            tbl = pq.read_table(partition.path)
            target = to_arrow_schema(self.schema)
            names = partition.names
            cols = []
            for f, afield in zip(self.schema.fields, target):
                phys = names.get(f.name) if names is not None else f.name
                if phys is not None and phys in tbl.column_names:
                    cols.append(tbl.column(phys).cast(afield.type))
                else:  # unmapped logical / physically absent: NULL-fill
                    cols.append(
                        pa.chunked_array(
                            [pa.nulls(tbl.num_rows, afield.type)]
                        )
                    )
            out = pa.Table.from_arrays(cols, schema=target)
            yield from out.to_batches()

    class SnapshotTableDataSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_table"

        def schema(self):
            return StructType.fromJson(_resolve(self.options)["schema"])

        def reader(self, schema):
            return SnapshotTableReader(self.options, schema)

    return SnapshotTableDataSource


def register_snapshot_table_source(spark) -> None:
    """Idempotent registration of the ``snapshot_table`` read format.
    Enables ``spark.sql.python.filterPushdown.enabled`` (runtime conf,
    default false in 4.1) — Spark refuses to initialise a Python
    reader that implements ``pushFilters`` while the flag is off."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(_build())
