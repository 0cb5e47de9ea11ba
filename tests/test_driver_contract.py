"""Mimics the driver's correctness gate: every queries() entry runs at
sf0.01 and (when an oracle exists) must match DuckDB on row count, schema
and order-insensitive values."""

import duckdb
import pandas as pd
import pytest

from de_ray.pipelines.driver_queries import REGISTRY

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [n for n, (_f, sql) in REGISTRY.items() if sql])
def test_query_matches_oracle(name):
    fn, sql = REGISTRY[name]
    got = _normalize(_to_df(fn(SF)))
    con = _con()
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: schema mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6)


@pytest.mark.parametrize("name", [n for n, (_f, sql) in REGISTRY.items() if sql is None])
def test_rows_only_queries_run(name):
    fn, _ = REGISTRY[name]
    df = _to_df(fn(SF))
    assert len(df) >= 0
    assert len(df.columns) >= 1
