"""Mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side on sf0.001 and compare row count +
sorted-column value equality (order-insensitive)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _query_names():
    from diive_ray.pipelines.queries import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    return sorted(ORACLE)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, con, ray_session):
    from diive_ray.pipelines.queries import ORACLE, QUERIES

    got = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    exp = _normalize(con.sql(ORACLE[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            np.testing.assert_allclose(
                g.astype(float), e.astype(float), rtol=0, atol=1.01e-6,
                err_msg=f"{name}.{c}", equal_nan=True,
            )
        else:
            # NaT == NaT is False under numpy equality: compare null
            # masks separately, values on the non-null rows
            gn, en = g.isna().to_numpy(), e.isna().to_numpy()
            assert (gn == en).all(), f"{name}.{c} null masks differ"
            assert (g.to_numpy()[~gn] == e.to_numpy()[~en]).all(), f"{name}.{c} differs"
