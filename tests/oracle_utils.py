"""Local replica of the driver's DuckDB-oracle comparison (t2 gate).

Stricter than the driver: exact value equality after dtype normalisation
(int widths → int64, floats must match to 1e-12 after the in-query
rounding, which in practice means bit-equal)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=0, atol=1e-12) | both_nan
            assert close.all(), (
                f"{name}.{c}: max abs diff {np.nanmax(np.abs(av - bv))} at "
                f"{np.argmax(~close)}: {av[~close][:5]} vs {bv[~close][:5]}"
            )
        else:
            same = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
            assert same.all(), f"{name}.{c}: mismatch {a[c][~same].head()} vs {b[c][~same].head()}"
