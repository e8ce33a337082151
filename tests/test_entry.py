"""Driver-gate rehearsal: every queries() entry runs, and every oracle_sql()
entry matches the Ray result on row count, column names and (order-insensitive)
values — the same comparison the driver performs at sf=0.01."""

import importlib.util
import math
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _load_entry():
    spec = importlib.util.spec_from_file_location("__ray_entry__",
                                                  "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(set((_load_entry()).oracle_sql()))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(entry_mod, con, name):
    got = _norm(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    want = _norm(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=1e-9, atol=1e-9)


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    rows_only = sorted(set(qs) - set(entry_mod.oracle_sql()))
    for name in rows_only:
        res = qs[name](SF_DIR)
        df = _to_pandas(res)
        assert df is not None
        assert len(df.columns) > 0


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
