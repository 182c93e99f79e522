"""Merging t-digest quantile sketch (stages/sketch.py, Dunning & Ertl):
compression bound, rank-error accuracy vs exact quantiles on skewed
data, mergeability (digest-of-parts == digest-of-whole within the
error bound), and the one-pass distributed quantile_sketch vs exact."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.sketch import (
    quantile_sketch,
    tdigest_compress,
    tdigest_quantile,
)

QS = np.array([0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99])


def _rank_error(values: np.ndarray, est: np.ndarray, qs: np.ndarray) -> np.ndarray:
    """|empirical rank of estimate - q| per quantile."""
    sv = np.sort(values)
    ranks = np.searchsorted(sv, est, side="left") / len(sv)
    return np.abs(ranks - qs)


def test_compress_bounds_centroids_and_conserves_mass():
    rng = np.random.Generator(np.random.Philox(key=51))
    v = rng.lognormal(0, 2.0, 50_000)
    m, w = tdigest_compress(v, np.ones(len(v)), delta=100.0)
    assert len(m) <= 2 * 100 + 2
    np.testing.assert_allclose(w.sum(), len(v))
    # weighted mean is conserved exactly (centroids are weighted means)
    np.testing.assert_allclose((m * w).sum() / w.sum(), v.mean(), rtol=1e-12)
    assert (np.diff(m) >= 0).all()  # centroid means are sorted


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "bimodal"])
def test_rank_error_within_bound(dist):
    rng = np.random.Generator(np.random.Philox(key=52))
    n = 200_000
    if dist == "lognormal":
        v = rng.lognormal(0, 2.0, n)
    elif dist == "uniform":
        v = rng.uniform(-5, 5, n)
    else:
        v = np.concatenate([rng.normal(0, 1, n // 2), rng.normal(100, 1, n // 2)])
    delta = 200.0
    m, w = tdigest_compress(v, np.ones(n), delta)
    est = tdigest_quantile(m, w, v.min(), v.max(), QS)
    err = _rank_error(v, est, QS)
    # k1 bound: rank error O(q(1-q)/delta); generous constant 8
    bound = np.maximum(8.0 * QS * (1 - QS) / delta, 2e-3)
    assert (err <= bound).all(), (err, bound)


def test_merge_matches_single_digest_accuracy():
    rng = np.random.Generator(np.random.Philox(key=53))
    v = rng.lognormal(0, 1.5, 120_000)
    delta = 200.0
    # 8 partial digests merged vs one digest over the whole array
    parts = np.array_split(v, 8)
    ms, ws = [], []
    for p in parts:
        m, w = tdigest_compress(p, np.ones(len(p)), delta)
        ms.append(m)
        ws.append(w)
    m_all, w_all = tdigest_compress(np.concatenate(ms), np.concatenate(ws), delta)
    np.testing.assert_allclose(w_all.sum(), len(v))
    est = tdigest_quantile(m_all, w_all, v.min(), v.max(), QS)
    err = _rank_error(v, est, QS)
    bound = np.maximum(8.0 * QS * (1 - QS) / delta, 2e-3)
    assert (err <= bound).all(), (err, bound)


def test_quantile_estimates_monotone():
    rng = np.random.Generator(np.random.Philox(key=54))
    v = rng.standard_normal(30_000)
    m, w = tdigest_compress(v, np.ones(len(v)), 100.0)
    qs = np.linspace(0, 1, 101)
    est = tdigest_quantile(m, w, v.min(), v.max(), qs)
    assert (np.diff(est) >= 0).all()
    assert est[0] == v.min() and est[-1] == v.max()


def test_quantile_sketch_distributed_vs_exact(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=55))
    frames = []
    for k, scale in (("a", 1.0), ("b", 3.0)):
        frames.append(
            pd.DataFrame({"k": k, "v": rng.lognormal(0, scale, 60_000)})
        )
    df = pd.concat(frames, ignore_index=True)
    got = quantile_sketch(
        rd.from_pandas(df).repartition(9),
        value_col="v", keys=["k"], qs=list(QS), delta=200.0,
    )
    for k in ("a", "b"):
        v = df.loc[df["k"] == k, "v"].to_numpy()
        sub = got[got["k"] == k].sort_values("q")
        err = _rank_error(v, sub["value"].to_numpy(), QS)
        bound = np.maximum(8.0 * QS * (1 - QS) / 200.0, 2e-3)
        assert (err <= bound).all(), (k, err, bound)
