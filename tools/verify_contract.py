"""Driver-contract verification: simulate the driver against __spark_entry__.

Runs entry(), every queries() callable, and compares oracle-backed queries
against DuckDB at atol=0 (bit-exact), mirroring the driver's canonicalizer
(sort columns by name, sort rows, hash values). Usage:

    python tools/verify_contract.py [sf_dir]          # default sf0.01
"""
import sys
import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    # driver-style: stringify unhashable cells would crash; keep raw to surface it
    return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def compare(a, b):
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, f"cols {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            # element mask (not allclose) so the reported row is the real
            # first float mismatch — a string-compare fallback misreports
            # non-finite or -0.0 cells ('nan' == 'nan' strings but the
            # float compare is what gated)
            af, bf = av.astype(float), bv.astype(float)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            ok, mask = bool(eq.all()), ~eq
        else:
            eqs = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).to_numpy()
            ok, mask = bool(eqs.all()), ~eqs
        if not ok:
            i = int(np.argmax(mask))
            return False, f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return True, ""


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    # entry() smoke runs in scoped mode too — it's the driver's first gate,
    # and skipping it in `only` runs previously left it untested in quick
    # iteration loops
    print("entry rows:", len(m.entry(spark).collect()))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = m.queries(), m.oracle_sql()
    fails = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as e:
            fails.append(name)
            print(f"ERR   {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            continue
        # driver canonicalizer chokes on unhashable cells (lists/arrays)
        bad_cells = [c for c in sdf.columns if len(sdf) and isinstance(sdf[c].iloc[0], (list, np.ndarray, dict))]
        if bad_cells:
            fails.append(name)
            print(f"UNHASHABLE {name}: array/map cells in {bad_cells}")
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as e:
            fails.append(name)
            print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:200]}")
            continue
        ok, why = compare(sdf, odf)
        if ok:
            print(f"MATCH {name} ({len(sdf)} rows)")
        else:
            fails.append(name)
            print(f"FAIL  {name}: {why}")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
