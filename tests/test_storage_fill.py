"""Expanding rolling-median storage gap-fill (stages/gaps.py:
expanding_rmedian_fill_frame vs the reference loop semantics of
flux/lowres/storage_correction.py:_gapfill_storage_term)."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.gaps import expanding_rmedian_fill_frame, storage_gapfill


def _reference_loop(strg: pd.Series, flux: pd.Series) -> pd.DataFrame:
    """Verbatim-semantics replica of the reference's expanding loop:
    window 3, 5, 7, ... rolling median of the ORIGINAL series, filling
    whatever is still missing each pass; fallback 0 when < 3 valid."""
    out = pd.DataFrame({"flux": flux, "gf": strg.copy()})
    out["flag"] = 0
    n_valid = int(strg.notna().sum())
    n = len(strg)
    w = 0
    still = out["gf"].isna()
    while n_valid >= 3 and still.any() and w < 2 * n + 1:
        w = 3 if w == 0 else w + 2
        rmed = strg.rolling(window=w, center=True, min_periods=3).median()
        out.loc[still, "gf"] = rmed[still]
        out.loc[still & out["gf"].notna(), "flag"] = 1
        still = out["gf"].isna()
    if still.any():
        out.loc[still, "gf"] = 0.0
        out.loc[still, "flag"] = 1
    out = out[out["flux"].notna()].copy()
    out["flux_corr"] = out["flux"] + out["gf"]
    return out


def _case(n=300, miss_frac=0.25, seed=2):
    rng = np.random.default_rng(seed)
    strg = pd.Series(rng.normal(0, 1, n))
    strg[rng.random(n) < miss_frac] = np.nan
    flux = pd.Series(rng.normal(5, 2, n))
    flux[rng.random(n) < 0.07] = np.nan
    return strg, flux


def test_matches_reference_expanding_loop():
    for seed in (2, 5, 9):
        strg, flux = _case(seed=seed)
        df = pd.DataFrame({"storage": strg, "flux": flux})
        got = expanding_rmedian_fill_frame(df)
        exp = _reference_loop(strg, flux)
        np.testing.assert_allclose(
            got["storage_gf"].to_numpy(), exp["gf"].to_numpy(), rtol=0, atol=0)
        np.testing.assert_array_equal(
            got["flag_strg_isfilled"].to_numpy(), exp["flag"].to_numpy())
        np.testing.assert_allclose(
            got["flux_corr"].to_numpy(), exp["flux_corr"].to_numpy())


def test_sparse_series_fallback_zero():
    df = pd.DataFrame({
        "storage": [np.nan, 1.0, np.nan, 2.0, np.nan],
        "flux": [1.0, 2.0, 3.0, np.nan, 5.0],
    })
    got = expanding_rmedian_fill_frame(df)  # only 2 valid -> all fills 0
    assert got["storage_gf"].tolist() == [0.0, 1.0, 0.0, 0.0]
    assert got["flag_strg_isfilled"].tolist() == [1, 0, 1, 1]


def test_long_gap_expands_window():
    # one valid cluster far from the gap: fill must still happen
    strg = pd.Series([np.nan] * 10 + [1.0, 2.0, 3.0])
    flux = pd.Series(range(13), dtype=float)
    got = expanding_rmedian_fill_frame(pd.DataFrame({"storage": strg, "flux": flux}))
    exp = _reference_loop(strg, flux)
    np.testing.assert_allclose(got["storage_gf"].to_numpy(), exp["gf"].to_numpy())


def test_distributed_matches_frame_and_partitioning(ray_session):
    strg, flux = _case(n=400, seed=7)
    df = pd.DataFrame({
        "k": ["a"] * 200 + ["b"] * 200,
        "pos": list(range(200)) + list(range(200)),
        "storage": strg, "flux": flux,
    })
    def run(parts):
        out = storage_gapfill(
            rd.from_pandas(df).repartition(parts),
            keys=["k"], order_by=["pos"]).to_pandas()
        return out.sort_values(["k", "pos"]).reset_index(drop=True)
    a, b = run(1), run(11)
    pd.testing.assert_frame_equal(a, b)
    # per-key equality with the frame op
    for k in ("a", "b"):
        sub = df[df.k == k].sort_values("pos").reset_index(drop=True)
        exp = expanding_rmedian_fill_frame(sub)
        got = a[a.k == k].reset_index(drop=True)
        np.testing.assert_allclose(
            got["storage_gf"].to_numpy(), exp["storage_gf"].to_numpy())
