"""Exact distributed ntile (stages/stratified.py) vs full-sort oracle,
incl. duplicate-heavy keys and the degenerate-distribution cap; compound
extremes 'season' standardization (stages/extremes.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.extremes import compound_extremes_frame
from diive_ray.stages.stratified import (
    assign_ntile,
    exact_ntile_boundaries,
    ntile_in_block,
)


def _oracle_ntile(z, ids, q):
    order = np.lexsort((ids, z))
    n = len(z)
    size, rem = divmod(n, q)
    sizes = [size + 1] * rem + [size] * (q - rem)
    bucket_sorted = np.repeat(np.arange(1, q + 1), sizes)
    out = np.empty(n, dtype=np.int64)
    out[order] = bucket_sorted
    return out


@pytest.mark.parametrize("q", [3, 8])
def test_exact_ntile_matches_full_sort(q):
    rng = np.random.Generator(np.random.Philox(key=31))
    n = 5000
    # ~30% duplicated values to exercise the (value, id) tie-break
    vals = np.round(rng.normal(size=n), 1)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"v": vals, "id": ids})
    bounds = exact_ntile_boundaries(rd.from_pandas(df), "v", "id", q)
    got = assign_ntile(vals, ids, bounds)
    np.testing.assert_array_equal(got, _oracle_ntile(vals, ids, q))


def test_ntile_in_block_matches_oracle():
    rng = np.random.Generator(np.random.Philox(key=32))
    vals = rng.integers(0, 5, size=997).astype(float)  # heavy ties
    ids = np.arange(997, dtype=np.int64)
    np.testing.assert_array_equal(
        ntile_in_block(vals, ids, 4), _oracle_ntile(vals, ids, 4)
    )


def test_collect_cap_raises_on_degenerate_key():
    df = pd.DataFrame({"v": np.zeros(4000), "id": np.arange(4000, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="duplicate class"):
        exact_ntile_boundaries(rd.from_pandas(df), "v", "id", 4, collect_cap=100)


def test_compound_extremes_season_mode():
    # 6 years of monthly values: august anomalously hot in 2023 only
    periods = pd.date_range("2019-01-31", periods=72, freq="ME")
    v1 = np.tile(np.sin(np.arange(12) / 12 * 2 * np.pi) * 10, 6)  # seasonal cycle
    v2 = np.zeros(72)
    rng = np.random.Generator(np.random.Philox(key=33))
    v1 = v1 + rng.normal(0, 0.5, 72)
    v2 = v2 + rng.normal(0, 0.5, 72)
    aug_2023 = 55  # index of 2023-08
    v1[aug_2023] += 30.0  # big anomaly vs other augusts
    v2[aug_2023] -= 30.0
    df = pd.DataFrame({"p": periods, "v1": v1, "v2": v2})
    out = compound_extremes_frame(
        df, period_col="p", v1="v1", v2="v2", agg="monthly",
        threshold=2.0, standardize_by="season",
    )
    row = out[out["p"] == periods[aug_2023]]
    assert row["category"].tolist() == ["compound"]
    # seasonal standardization must NOT flag ordinary august peaks
    other_augs = out[(out["p"].dt.month == 8) & (out["p"] != periods[aug_2023])]
    assert (other_augs["category"] == "none").all()
    # 'record' mode (no deseasonalization) flags the seasonal cycle itself
    rec = compound_extremes_frame(
        df, period_col="p", v1="v1", v2="v2", agg="monthly",
        threshold=2.0, standardize_by="record",
    )
    assert (rec["category"] != "none").sum() >= 1
