"""LTTB downsampling (stages/downsample.py:lttb_frame, Steinarsson 2013)."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.downsample import lttb_downsample, lttb_frame


def _naive_lttb(x, y, n_out):
    """Direct transliteration of the thesis algorithm for pinning."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return list(range(n))
    bounds = [int(1 + i * (n - 2) / (n_out - 2)) for i in range(n_out - 1)] + [n - 1]
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        if i == n_out - 3:
            nxt = list(range(bounds[i + 1], n))
        else:
            nxt = list(range(bounds[i + 1], bounds[i + 2]))
        cx = sum(x[j] for j in nxt) / len(nxt)
        cy = sum(y[j] for j in nxt) / len(nxt)
        best, barg = -1.0, lo
        for j in range(lo, hi):
            area = abs((x[a] - cx) * (y[j] - y[a]) - (x[a] - x[j]) * (cy - y[a]))
            if area > best:
                best, barg = area, j
        sel.append(barg)
        a = barg
    sel.append(n - 1)
    return sel


def test_matches_naive_reference():
    rng = np.random.default_rng(3)
    for n, k in ((500, 50), (333, 20), (100, 7)):
        x = np.sort(rng.uniform(0, 1000, n))
        y = rng.normal(0, 5, n).cumsum()
        assert lttb_frame(x, y, k).tolist() == _naive_lttb(x, y, k)


def test_endpoints_and_counts():
    x = np.arange(1000.0)
    y = np.sin(x / 30)
    sel = lttb_frame(x, y, 40)
    assert len(sel) == 40
    assert sel[0] == 0 and sel[-1] == 999
    assert (np.diff(sel) > 0).all()  # strictly increasing picks


def test_spike_is_kept():
    x = np.arange(500.0)
    y = np.zeros(500); y[250] = 100.0
    sel = lttb_frame(x, y, 25)
    assert 250 in sel


def test_small_series_passthrough():
    x = np.arange(5.0); y = x * 2
    assert lttb_frame(x, y, 10).tolist() == [0, 1, 2, 3, 4]


def test_distributed_matches_frame(ray_session):
    rng = np.random.default_rng(11)
    frames = []
    for k in ("a", "b"):
        ts = pd.date_range("2022-01-01", periods=400, freq="h")
        frames.append(pd.DataFrame({
            "k": k, "bucket_ts": ts, "mean": rng.normal(size=400).cumsum()}))
    df = pd.concat(frames, ignore_index=True)
    got = lttb_downsample(
        rd.from_pandas(df).repartition(9), keys=["k"], order_by=["bucket_ts"],
        x_col="bucket_ts", y_col="mean", n_out=30).to_pandas()
    for k in ("a", "b"):
        sub = df[df.k == k].reset_index(drop=True)
        exp = lttb_frame(
            sub.index.to_numpy(np.float64) * 0 +
            (sub["bucket_ts"].astype("int64").to_numpy(np.float64)),
            sub["mean"].to_numpy(), 30)
        g = got[got.k == k].sort_values("lttb_rank")
        assert g["bucket_ts"].tolist() == sub["bucket_ts"].iloc[exp].tolist()
