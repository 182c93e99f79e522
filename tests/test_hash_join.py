"""Distributed equi-join (stages/joins.py:hash_join/broadcast_join) vs
single-frame pandas oracles: inner/left/semi/anti, null-key SQL
semantics, payload-name clashes, key-type casts, int dtype survival,
duplicate keys on both sides, and broadcast == hash-join equality."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.joins import broadcast_join, hash_join


@pytest.fixture(scope="module")
def sides():
    rng = np.random.Generator(np.random.Philox(key=11))
    n = 500
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 60, size=n).astype(np.int64),
            "lx": rng.normal(size=n),
            "tag": rng.choice(list("xyz"), size=n),
        }
    )
    # null keys on a few left rows (SQL: never match)
    left.loc[left.index[:7], "k"] = np.nan
    m = 150
    right = pd.DataFrame(
        {
            # int32 on purpose: hash_join must cast to left's int64
            "k": rng.integers(0, 80, size=m).astype(np.int32),
            "ry": rng.integers(0, 1000, size=m).astype(np.int64),
            "tag": rng.choice(list("pq"), size=m),  # clashes with left.tag
        }
    )
    return left, right


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _pd_oracle(left: pd.DataFrame, right: pd.DataFrame, how: str) -> pd.DataFrame:
    r = right.rename(columns={"tag": "tag_r"}).copy()
    r["k"] = r["k"].astype(np.float64)  # align for merge with left's NaN-bearing key
    r = r.dropna(subset=["k"])
    lnull = left["k"].isna()
    if how == "inner":
        return left[~lnull].merge(r, on="k", how="inner")
    if how == "left":
        out = left[~lnull].merge(r, on="k", how="left")
        return pd.concat([out, left[lnull].reindex(columns=out.columns)], ignore_index=True)
    rk = r[["k"]].drop_duplicates()
    if how == "semi":
        return left[~lnull].merge(rk, on="k", how="inner")
    m = left[~lnull].merge(rk.assign(_m=1), on="k", how="left")
    return pd.concat([m[m["_m"].isna()].drop(columns="_m"), left[lnull]], ignore_index=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_vs_pandas(ray_session, sides, how):
    left, right = sides
    got = hash_join(
        rd.from_pandas(left).repartition(7),
        rd.from_pandas(right).repartition(5),
        on="k",
        how=how,
    ).to_pandas()
    exp = _pd_oracle(left, right, how)
    if how in ("semi", "anti"):
        assert sorted(got.columns) == sorted(left.columns)
    else:
        assert "tag_r" in got.columns and "tag" in got.columns
    pd.testing.assert_frame_equal(canon(got), canon(exp), check_dtype=False)


def test_inner_preserves_int_dtype(ray_session):
    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "a": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 20, 2, dtype=np.int64), "b": np.arange(10, dtype=np.int64)})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="inner").to_pandas()
    assert got["a"].dtype.kind == "i" and got["b"].dtype.kind == "i" and got["k"].dtype.kind == "i"
    assert len(got) == 5


def test_broadcast_matches_hash(ray_session, sides):
    left, right = sides
    small = right.rename(columns={"tag": "tag_r"})
    small["k"] = small["k"].astype(np.int64)
    got_b = broadcast_join(
        rd.from_pandas(left).repartition(7), small, on="k", how="inner"
    ).to_pandas()
    got_h = hash_join(
        rd.from_pandas(left).repartition(7), rd.from_pandas(right).repartition(5),
        on="k", how="inner",
    ).to_pandas()
    pd.testing.assert_frame_equal(canon(got_b), canon(got_h), check_dtype=False)


def test_duplicate_keys_multiply(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "a": [10, 11, 12]})
    right = pd.DataFrame({"k": [1, 1, 3], "b": [7, 8, 9]})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="inner").to_pandas()
    assert len(got) == 4  # 2 left x 2 right on k=1
    semi = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="semi").to_pandas()
    assert len(semi) == 2  # no multiplication on semi
    anti = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="anti").to_pandas()
    assert list(anti["k"]) == [2]


def test_key_missing_raises(ray_session):
    left = pd.DataFrame({"k": [1], "a": [1]})
    right = pd.DataFrame({"z": [1]})
    with pytest.raises(ValueError, match="join key"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
