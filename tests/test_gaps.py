"""Gap table + gap-fill semantics (FIXTURES.md F2/F3;
reference: gapfinder.py, interpolate.py)."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.pipelines.rollup import tokens_cascade
from diive_ray.schema import US_PER_MIN
from diive_ray.stages.gaps import (
    find_gap_runs,
    gap_run_lengths,
    gap_table,
    gapfill_rollup,
    linear_interpolation_limited,
    regularize_frame,
    rolling_median_fill,
)
from diive_ray.util import ts_to_us

from . import oracle


# ----------------------------------------------------------- pandas kernels


def test_find_gap_runs_matches_loop_oracle():
    rng = np.random.default_rng(7)
    s = pd.Series(rng.normal(size=500))
    s[rng.random(500) < 0.3] = np.nan
    got = find_gap_runs(s.isna().to_numpy())
    exp = oracle.gap_runs(s)
    assert got == exp


def test_linear_interpolation_limited_matches_loop_oracle():
    rng = np.random.default_rng(11)
    s = pd.Series(rng.normal(size=400))
    s[rng.random(400) < 0.35] = np.nan
    s.iloc[:3] = np.nan  # edge gap: must stay (limit_area='inside')
    s.iloc[-2:] = np.nan
    for limit in (1, 2, 5):
        got = linear_interpolation_limited(s, limit)
        exp = oracle.linear_fill_limited(s, limit)
        pd.testing.assert_series_equal(got, exp)
        # observed values never modified
        obs = s.notna()
        pd.testing.assert_series_equal(got[obs], s[obs])


def test_gap_run_lengths():
    isna = np.array([True, True, False, True, False, False, True, True, True])
    assert gap_run_lengths(isna).tolist() == [2, 2, 0, 1, 0, 0, 3, 3, 3]


def test_rolling_median_fill_preserves_observed():
    s = pd.Series([1.0, np.nan, 3.0, 4.0, np.nan, 6.0, 7.0])
    out = rolling_median_fill(s, window=5, min_periods=2)
    obs = s.notna()
    pd.testing.assert_series_equal(out[obs], s[obs])
    assert out.notna().all()


# ----------------------------------------------------------- Dataset stages


@pytest.fixture(scope="module")
def tiers_nomask(tiny_fixture_path):
    return tokens_cascade(tiny_fixture_path, mincounts_perc=0.0)


def test_gap_table_finds_injected_gap(tiers_nomask):
    """The 120-second deleted run (GAP_RUNS, idx 3001..3120) leaves exactly
    one fully-empty 1m bucket in s00's unmasked tier."""
    gt = gap_table(tiers_nomask["1m"], US_PER_MIN).to_pandas()
    s00 = gt[gt["source"] == "s00"]
    assert len(s00) == 1
    row = s00.iloc[0]
    assert row["GAP_LENGTH"] == 1
    assert pd.Timestamp(row["GAP_START"]) == pd.Timestamp("2022-07-01 00:52:00")


def test_gapfill_fills_and_preserves(tiny_fixture_path):
    tiers = tokens_cascade(tiny_fixture_path, mincounts_perc=0.9, gapfill=True)
    t1m = tiers["1m"].to_pandas()
    filled = tiers["1m_filled"].to_pandas()
    s00 = filled[filled["source"] == "s00"].sort_values("bucket_ts").reset_index(drop=True)
    raw = t1m[t1m["source"] == "s00"].sort_values("bucket_ts").reset_index(drop=True)
    # grid is dense
    us = ts_to_us(s00["bucket_ts"])
    assert (np.diff(us) == US_PER_MIN).all()
    # observed buckets keep their mean exactly, fill_method==0
    m = s00.merge(raw[["bucket_ts", "mean"]], on="bucket_ts", suffixes=("", "_raw"))
    np.testing.assert_array_equal(m["mean_filled"].to_numpy(), m["mean_raw"].to_numpy())
    obs_methods = s00.loc[s00["mean"].notna(), "fill_method"]
    assert (obs_methods == 0).all()
    # missing buckets were filled by some method
    missing = s00[s00["mean"].isna()]
    assert len(missing) > 0
    assert missing["mean_filled"].notna().all()
    assert set(missing["fill_method"].unique()) <= {1.0, 2.0}

    # linear fills match the loop oracle applied to the regularized series
    reg = regularize_frame(raw.copy(), US_PER_MIN)
    exp_lin = oracle.linear_fill_limited(reg["mean"], 5)
    lin_rows = s00["fill_method"] == 1
    np.testing.assert_allclose(
        s00.loc[lin_rows, "mean_filled"].to_numpy(),
        exp_lin[lin_rows.to_numpy()].to_numpy(),
        rtol=1e-12,
    )


def test_gapfill_chunked_equals_whole_series(tiers_nomask, tiny_fixture_path):
    tiers = tokens_cascade(tiny_fixture_path, mincounts_perc=0.9)
    whole = gapfill_rollup(tiers["1m"], US_PER_MIN, interp_limit=5, rmed_window=10).to_pandas()
    chunked = gapfill_rollup(
        tiers["1m"], US_PER_MIN, interp_limit=5, rmed_window=10, chunk_span_buckets=13
    ).to_pandas()
    cols = ["source", "bucket_ts", "mean_filled", "fill_method"]
    w = whole[cols].sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    c = chunked[cols].sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    assert len(w) == len(c)
    assert (w["bucket_ts"].to_numpy() == c["bucket_ts"].to_numpy()).all()
    np.testing.assert_array_equal(w["mean_filled"].to_numpy(), c["mean_filled"].to_numpy())
    np.testing.assert_array_equal(w["fill_method"].to_numpy(), c["fill_method"].to_numpy())
