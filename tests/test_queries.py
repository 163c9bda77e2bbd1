"""Driver-contract rehearsal: queries() vs oracle_sql() via DuckDB, sf0.001.

Mirrors what the driver does at sf0.01: run the Ray pipeline and the SQL
side-by-side, compare row counts and order-insensitive values.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def test_all_queries_match_oracle(entry_mod, con):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle_sql keys must be a subset of queries"
    failures = []
    for name, fn in qs.items():
        raw = to_pandas(fn(SF_DIR))
        assert len(raw) >= 0  # rows-only check for oracle-less queries
        if name not in oracles:
            continue  # list-typed rows-only results are not canonicalizable
        got = canonical(raw)
        want = canonical(con.execute(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
        except AssertionError as e:
            failures.append(f"{name}: values differ: {str(e).splitlines()[-1]}")
    assert not failures, "\n".join(failures)


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    assert "conv_id" in df.columns and "turn_count" in df.columns
