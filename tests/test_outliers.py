"""Outlier-detector kernels: seeded-spike golden tests (FIXTURES.md F1
defect 4; reference test style tests/test_outlierdetection.py:23-70) and
distributed == kernel equivalence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray import fixtures as fx
from diive_ray.stages import outliers as ol


def _series_with_spikes(n=3000, source="s00"):
    """Clean diurnal n_tok plus the fixture's deterministic impulse
    spikes; returns (series, spike positions)."""
    idx = np.arange(n)
    clean = fx.clean_n_tok(source, idx).astype(float)
    spiked = fx.spiked_n_tok(source, idx).astype(float)
    mask = fx.spike_mask(source, idx)
    return pd.Series(spiked), np.flatnonzero(mask), pd.Series(clean)


def test_zscore_flags_spikes_exactly():
    s, spikes, clean = _series_with_spikes()
    flag = ol.zscore_flag(s, thres_zscore=4, repeat=True)
    got = set(np.flatnonzero(flag.to_numpy() == 2))
    # every hard spike (>= 4x the clean level) must be caught; clean rows
    # (bounded diurnal + noise) must survive: exact set equality against
    # the big-spike ground truth
    sp = s.to_numpy()
    cl = clean.to_numpy()
    big = {int(i) for i in spikes if sp[i] > 4 * cl[i] or sp[i] < 0.25 * cl[i]}
    assert big <= got
    # flagged rows are injected spikes, apart from the handful of clean
    # extremes the iterate-to-convergence loop legitimately reveals
    # (flagbase.py:155-187 tightens the band each round)
    assert len(got - set(spikes.tolist())) <= 5


def test_zscore_iteration_converges_and_monotone():
    s, spikes, _ = _series_with_spikes()
    f1 = ol.zscore_flag(s, thres_zscore=4, repeat=False)
    f_all = ol.zscore_flag(s, thres_zscore=4, repeat=True)
    n1 = (f1 == 2).sum()
    nall = (f_all == 2).sum()
    assert nall >= n1 > 0
    # converged: one more round on the masked series finds nothing
    masked = s.copy()
    masked[f_all == 2] = np.nan
    extra = ol.zscore_flag(masked, thres_zscore=4, repeat=False)
    assert (extra == 2).sum() == 0


def test_hampel_catches_spikes():
    s, spikes, clean = _series_with_spikes(2000)
    flag = ol.hampel_flag(s, window_length=100, n_sigma=5.5, repeat=True)
    got = set(np.flatnonzero(flag.to_numpy() == 2).tolist())
    sp, cl = s.to_numpy(), clean.to_numpy()
    big = {int(i) for i in spikes if sp[i] > 5 * cl[i]}
    assert big <= got
    # double-differencing (hampel.py:206-209) makes d large at the spike
    # AND its two neighbors, so flagged rows must lie within 1 record of
    # an injected spike
    near_spike = set()
    for i in spikes:
        near_spike.update((int(i) - 1, int(i), int(i) + 1))
    assert got <= near_spike


def test_localsd_strict_inequality_keeps_boundary():
    s = pd.Series(np.concatenate([np.zeros(50), [100.0], np.zeros(50)]))
    flag = ol.localsd_flag(s, n_sd=2, winsize=20, repeat=False)
    assert flag.iloc[50] == 2
    assert (flag.drop(index=50) == 0).all()


def test_abs_limits_flag():
    s = pd.Series([1.0, 5.0, np.nan, -3.0, 10.0])
    f = ol.abs_limits_flag(s, 0.0, 6.0)
    assert f.tolist() == [0, 0, 0, 2, 2]


def test_trimlow_symmetric_count():
    rng = np.random.default_rng(3)
    s = pd.Series(rng.normal(100, 5, size=500))
    s.iloc[[5, 50, 200]] = [-10.0, -20.0, -5.0]
    f = ol.trimlow_flag(s, lower_limit=0.0)
    rej = s[f == 2]
    assert (rej < 0).sum() == 3
    # an equal count trimmed from the top
    assert len(rej) == 6
    top3 = s.sort_values(ascending=False).head(3)
    assert set(top3.index) <= set(rej.index)


def test_zscore_increments_needs_all_three():
    # an isolated level shift: big diff to prev only -> NOT an outlier;
    # a single spike: big diffs both ways and double-diff -> outlier
    base = np.zeros(200)
    base[100] = 50.0  # spike
    shifted = np.concatenate([np.zeros(100), np.full(100, 30.0)])
    f_spike = ol.zscore_increments_flag(pd.Series(base), thres_zscore=3, repeat=False)
    f_shift = ol.zscore_increments_flag(pd.Series(shifted), thres_zscore=3, repeat=False)
    assert f_spike.iloc[100] == 2
    assert (f_shift == 2).sum() == 0


def test_missing_flag():
    s = pd.Series([1.0, np.nan, 2.0])
    assert ol.missing_flag(s).tolist() == [0, 2, 0]


def test_manual_removal_flag():
    ts = pd.Series(pd.date_range("2022-07-01", periods=10, freq="1min"))
    s = pd.Series(np.arange(10.0))
    f = ol.manual_removal_flag(s, ts, ["2022-07-01 00:03:00", ("2022-07-01 00:06:00", "2022-07-01 00:08:00")])
    assert np.flatnonzero(f.to_numpy() == 2).tolist() == [3, 6, 7, 8]


def test_distributed_zscore_matches_kernel(tiny_fixture_path):
    ds = rd.read_parquet(tiny_fixture_path, columns=["doc_id", "source", "ts", "n_tok"])
    got = ol.zscore_global_distributed(
        ds, value_col="n_tok", keys=("source",), thres_zscore=4, repeat=True
    ).to_pandas()
    exp_frames = []
    for src, g in got.groupby("source"):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        flag = ol.zscore_flag(g["n_tok"].astype(float), thres_zscore=4, repeat=True)
        g["exp_flag"] = flag.to_numpy()
        exp_frames.append(g)
    cmp = pd.concat(exp_frames)
    assert (cmp["FLAG_n_tok_ZSCORE_TEST"].to_numpy() == cmp["exp_flag"].to_numpy()).all()


def test_flag_outliers_wrapper_masks(tiny_fixture_path):
    ds = rd.read_parquet(tiny_fixture_path, columns=["doc_id", "source", "ts", "n_tok"])
    out = ol.flag_outliers(
        ds, "zscore", value_col="n_tok", keys=("source",), thres_zscore=4, mask_values=True
    ).to_pandas()
    flagged = out[out["FLAG_n_tok_ZSCORE_TEST"] == 2]
    assert len(flagged) > 0
    assert flagged["n_tok"].isna().all()
