"""Driver-style result comparison: row count + schema names + order-insensitive
value equality between a Ray result and a DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def assert_equivalent(ray_result, sql: str, sf_dir: str, float_tol: float = 1e-9):
    got = to_df(ray_result)
    want = run_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        sorted(got.columns),
        sorted(want.columns),
    )
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    for c in cols:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            assert (
                (g.astype(float) - w.astype(float)).abs().max() <= float_tol
            ), c
        else:
            assert g.astype(str).equals(w.astype(str)), c
