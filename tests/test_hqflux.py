"""hqflux stage kernels: uniques histogram vs np.histogram reference
semantics, gradient peak-range detection vs the reference scan, planted
outliers through hq_flux_frame, and the timelag frame end-to-end."""

import numpy as np
import pandas as pd

from diive_ray.stages.hqflux import (
    SENTINEL,
    adjust_range_for_eddypro,
    detect_peak_range,
    hq_flux_frame,
    timelag_analysis_frame,
    uniques_histogram,
)


def _reference_uniques_histogram(series: np.ndarray, fringe):
    """Reference Histogram._calc for method='uniques'
    (analysis/histogram.py:88-124), verbatim semantics."""
    bins = np.unique(series)
    counts, edges = np.histogram(series, bins=bins)
    i, j = fringe
    counts = counts[i:len(counts) - j]
    edges = edges[i:len(edges) - j - 1]
    return pd.DataFrame({"BIN_START_INCL": edges, "COUNTS": counts})


def test_uniques_histogram_matches_numpy_reference():
    rng = np.random.default_rng(7)
    vals = 0.05 * rng.integers(0, 40, size=5000)
    uniq, cnt = np.unique(vals, return_counts=True)
    for fringe in [(0, 0), (5, 10), (3, 0), (0, 4)]:
        got = uniques_histogram(uniq, cnt, ignore_fringe_bins=fringe)
        exp = _reference_uniques_histogram(vals, fringe)
        np.testing.assert_array_equal(got["BIN_START_INCL"].to_numpy(),
                                      exp["BIN_START_INCL"].to_numpy())
        np.testing.assert_array_equal(got["COUNTS"].to_numpy(),
                                      exp["COUNTS"].to_numpy())


def test_uniques_histogram_merges_last_bin():
    # counts [1, 2, 3] over values [0, 1, 2]: np.histogram with edges
    # [0,1,2] closes the last interval -> bins [0,1] with counts [1, 5]
    got = uniques_histogram(np.array([0.0, 1.0, 2.0]), np.array([1, 2, 3]))
    assert got["BIN_START_INCL"].tolist() == [0.0, 1.0]
    assert got["COUNTS"].tolist() == [1, 5]


def _reference_detect_peak_range(hist, peak, thr):
    """Reference TimeLagAnalysis.detect_peak_range loop
    (timelag_analysis.py:267-346), verbatim."""
    bins = hist["BIN_START_INCL"].values
    counts = hist["COUNTS"].values
    max_count = counts.max()
    normalized = counts / max_count if max_count > 0 else counts
    gradient = np.gradient(normalized)
    peak_idx = np.argmin(np.abs(bins - peak))
    left_idx = peak_idx
    for i in range(peak_idx - 1, -1, -1):
        if np.abs(gradient[i]) < thr:
            left_idx = i
            break
    right_idx = peak_idx
    for i in range(peak_idx + 1, len(gradient)):
        if np.abs(gradient[i]) < thr:
            right_idx = i
            break
    return bins[left_idx], bins[right_idx]


def test_detect_peak_range_matches_reference_scan():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(3, 30))
        hist = pd.DataFrame({
            "BIN_START_INCL": 0.05 * np.arange(n),
            "COUNTS": rng.integers(1, 100, size=n),
        })
        peak = float(hist.loc[hist["COUNTS"].idxmax(), "BIN_START_INCL"])
        for thr in (0.05, 0.15, 0.5):
            got = detect_peak_range(hist, peak, thr)
            exp = _reference_detect_peak_range(hist, peak, thr)
            assert got == (float(exp[0]), float(exp[1]))


def test_adjust_range_for_eddypro():
    assert adjust_range_for_eddypro(0.10, 1.00) == (0.05, 1.05)


def _synthetic_flux(n_days=20, spikes=(100, 500, 900)):
    ts = pd.date_range("2021-06-01", periods=n_days * 48, freq="30min")
    t = np.arange(len(ts), dtype=float)
    flux = 5.0 * np.sin(2 * np.pi * (t % 48) / 48) + 0.01 * np.cos(t / 17.0)
    for s in spikes:
        flux[s] += 60.0
    return pd.DataFrame({"ts": ts, "event_id": np.arange(len(ts)), "value": flux})


def test_hq_flux_frame_flags_planted_spikes():
    df = _synthetic_flux()
    out = hq_flux_frame(df, value_col="value", ts_col="ts",
                        order_cols=("event_id",), lat=47.0, lon=8.5,
                        window_length=49, median_window=49, repeat=False)
    assert set(out["flag_daytime"]) == {0, 1}
    assert out["n_outliers"].sum() >= 3
    assert (out["n"] > 0).all()
    # filtered max in each regime is below the spike magnitude
    assert (out["max_nonneg"] < 30.0).all()
    # the sinusoid has negatives in both regimes
    assert (out["min_neg"] < 0).all()
    assert (out["sd_filtered"] > 0).all()
    assert (out["winsize"] == 49).all()


def test_hq_flux_frame_sentinel_when_no_negatives():
    df = _synthetic_flux()
    df["value"] = df["value"] + 100.0  # strictly positive
    out = hq_flux_frame(df, value_col="value", ts_col="ts",
                        order_cols=("event_id",), median_window=49)
    assert (out["max_neg"] == SENTINEL).all()
    assert (out["min_neg"] == SENTINEL).all()
    assert (out["max_nonneg"] > 0).all()


def test_hq_flux_frame_auto_winsize():
    df = _synthetic_flux(n_days=10, spikes=(100, 250, 400))
    out = hq_flux_frame(df, value_col="value", ts_col="ts",
                        order_cols=("event_id",), median_window=None)
    # reference rule: winsize = n_filtered // 10 floored at 13
    for _, row in out.iterrows():
        n_filtered = row["n"] - row["n_outliers"]
        assert row["winsize"] == max(n_filtered // 10, 13)


def test_timelag_analysis_frame_known_peak():
    # a sharp peak at 0.50 s over a flat background: gradient is steep
    # around the peak and ~0 in the tails
    lags = 0.05 * np.arange(41)  # 0.00 .. 2.00, last bin merges away
    counts = np.full(41, 10, dtype=np.int64)
    counts[10] = 500  # peak at 0.50
    counts[9] = 120
    counts[11] = 120
    df = pd.DataFrame({"gas": "CO2", "tlag": lags, "n": counts})
    out = timelag_analysis_frame(
        df, "gas", "tlag", "n", ignore_fringe_bins=(2, 2),
        histogram_startbin=0.0, histogram_endbin=10.0,
        gradient_threshold=0.15,
    )
    assert len(out) == 1
    row = out.iloc[0]
    assert row["peak"] == 0.50
    assert row["peak_min"] < 0.50 < row["peak_max"]
    assert row["eddypro_min"] == row["peak_min"] - 0.05
    assert row["eddypro_max"] == row["peak_max"] + 0.05
    # flat tails are inside the detected range's complement
    assert row["peak_min"] >= 0.30 and row["peak_max"] <= 0.70


def test_timelag_analysis_frame_multi_key_deterministic():
    rng = np.random.default_rng(3)
    frames = []
    for gas in ("CO2", "H2O"):
        lags = 0.05 * np.arange(40)
        counts = rng.integers(5, 50, size=40)
        counts[rng.integers(8, 30)] += 300
        frames.append(pd.DataFrame({"gas": gas, "tlag": lags, "n": counts}))
    df = pd.concat(frames, ignore_index=True)
    out1 = timelag_analysis_frame(df, "gas", "tlag", "n")
    out2 = timelag_analysis_frame(df.sample(frac=1, random_state=5), "gas", "tlag", "n")
    pd.testing.assert_frame_equal(out1, out2)
    assert list(out1["gas"]) == ["CO2", "H2O"]
