#!/usr/bin/env python
"""Generate a larger-SF rehearsal fixture by deterministic replication of
an existing driver fixture (default: sf0.1 x10 -> "sf1").

Usage:
    python tools/make_scale_fixture.py [src_dir] [dst_dir] [factor]

Replication strategy (per replica i in 0..factor-1; replica 0 is the
original, bit-identical):

- Star-schema tables: every key column (orderkey / custkey / partkey /
  suppkey / event_id / user_id / doc_id / vec_id) is shifted by
  i * (max_key + 1) consistently across tables, so FK joins line up
  within a replica and replicas are disjoint. region/nation (tiny dims
  FK'd by nationkey) are copied unshifted.
- documents.text: replica i >= 1 applies a GLOBAL per-replica token remap
  (~40% of vocabulary gets an "x{i}" suffix, crc32-selected). A bijective
  global remap preserves within-replica shingle structure EXACTLY (the
  near-dup pair/cluster density per replica matches the source fixture),
  while cross-replica 3-gram Jaccard collapses to ~0.36^3 ~ 0.02 — far
  below the 0.5 near-dup threshold — so pair counts scale ~linearly with
  corpus size, as a real crawl's would, instead of exploding quadratically
  from artificial exact duplicates. Two caveats learned in round 13:
  (a) ALWAYS replicate from the ORIGINAL driver fixture, never compose
  (e.g. sf20 must be sf0.1 x200, NOT sf10 x2): a composed build reuses
  salt values already present in its input, so replica j of the composed
  pass regenerates token streams identical to the input's replica-j docs
  — artificial cross-replica EXACT duplicates (measured: 3.5x pair
  growth for 2x docs before the round-13 rebuild);
  (b) even a clean build leaves a mild superlinear PAIR tail: a doc
  whose every token falls in the unmapped ~60% for a given salt is
  byte-identical in that replica (P ~ 0.6^k for k distinct tokens), so
  short docs form cross-replica exact-dup groups whose size grows with
  the replica count and whose PAIR count grows quadratically in group
  size. Interpret dedup pair-count growth against this artifact (engine
  health = cost per emitted pair), or compare rehearsals at matched
  replica counts.
- events.ts / dates / measures: unchanged (identical distributions per
  replica; user_id/event_id disjointness keeps sessions and windows
  per-replica).

The output is a PERF REHEARSAL fixture (scaling exponents), not a
correctness oracle target — oracles keep running against the driver's
own fixtures.
"""
from __future__ import annotations

import os
import sys
import zlib

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key family -> columns that carry it (across all tables)
KEY_COLS = {
    "orderkey": ["o_orderkey", "l_orderkey"],
    "custkey": ["c_custkey", "o_custkey"],
    "partkey": ["p_partkey", "l_partkey", "ps_partkey"],
    "suppkey": ["s_suppkey", "l_suppkey", "ps_suppkey"],
    "event_id": ["event_id"],
    "user_id": ["user_id"],
    "doc_id": ["doc_id"],
    "vec_id": ["vec_id"],
}


def _remap_text(text: str, salt: int, cache: dict) -> str:
    out = []
    for w in text.split(" "):
        m = cache.get(w)
        if m is None:
            m = f"{w}x{salt}" if zlib.crc32(f"{w}|{salt}".encode()) % 100 < 40 else w
            cache[w] = m
        out.append(m)
    return " ".join(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    # per-family shift base = max over every table that carries the key
    shift: dict[str, int] = {}
    cols_by_table: dict[str, list[str]] = {}
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        cols_by_table[t] = cols
        for fam, fam_cols in KEY_COLS.items():
            for c in fam_cols:
                if c in cols:
                    mx = con.execute(
                        f"SELECT max({c}) FROM read_parquet('{src}/{t}.parquet')"
                    ).fetchone()[0]
                    shift[fam] = max(shift.get(fam, 0), int(mx) + 1)

    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        if t in ("region", "nation"):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{out}' (FORMAT PARQUET)"
            )
            print(t, "copied")
            continue
        if t == "documents":
            import pandas as pd

            base = con.execute(
                f"SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).df()
            parts = []
            for i in range(factor):
                rep = base.copy()
                rep["doc_id"] = rep["doc_id"] + i * shift["doc_id"]
                if i > 0:
                    cache: dict = {}
                    rep["text"] = [
                        _remap_text(x, i, cache) for x in rep["text"]
                    ]
                    rep["n_chars"] = rep["text"].str.len()
                parts.append(rep)
            allrep = pd.concat(parts, ignore_index=True)
            con.register("docs_rep", allrep)
            con.execute(f"COPY (SELECT * FROM docs_rep ORDER BY doc_id) TO '{out}' (FORMAT PARQUET)")
            con.unregister("docs_rep")
            print(t, len(allrep))
            continue
        cols = cols_by_table[t]
        selects = []
        for c in cols:
            fam = next(
                (f for f, fc in KEY_COLS.items() if c in fc), None
            )
            if fam:
                selects.append(f"{c} + i * {shift[fam]} AS {c}")
            else:
                selects.append(c)
        sel = ", ".join(selects)
        con.execute(
            f"""COPY (
                SELECT {sel}
                FROM read_parquet('{src}/{t}.parquet'), range({factor}) r(i)
            ) TO '{out}' (FORMAT PARQUET)"""
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
