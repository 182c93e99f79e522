"""Distributed PCA: one-combine covariance moments, projection parity
with local numpy, partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.similarity import (
    embedding_covariance,
    embedding_moments,
    embedding_pca_project,
)


@pytest.fixture(scope="module")
def vecs(ray_session):
    rng = np.random.Generator(np.random.Philox(key=[77, 2026]))
    # anisotropic cloud: two dominant directions the PCA must find
    base = rng.standard_normal((300, 2)) @ rng.standard_normal((2, 16)) * 3.0
    x = base + rng.standard_normal((300, 16)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(300),
                       "embedding": [v.astype(np.float32).tolist() for v in x]})
    return df, rd.from_pandas(df).repartition(5)


def test_covariance_matches_numpy(vecs):
    df, ds = vecs
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    want = np.cov(x, rowvar=False, ddof=1)
    got = embedding_covariance(ds)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_moments_partition_invariant(vecs):
    df, ds = vecs
    n1, s1, x1 = embedding_moments(ds)
    n2, s2, x2 = embedding_moments(rd.from_pandas(df).repartition(11))
    assert n1 == n2 == 300
    np.testing.assert_allclose(s1, s2, rtol=1e-12)
    np.testing.assert_allclose(x1, x2, rtol=1e-12)


def test_pca_projection_matches_local(vecs):
    df, ds = vecs
    proj, comps = embedding_pca_project(ds, k=3)
    got = proj.to_pandas().sort_values("vec_id").reset_index(drop=True)

    x = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    w = evecs[:, order].T
    flip = np.sign(w[np.arange(3), np.abs(w).argmax(axis=1)])
    w = w * flip[:, None]
    want = (x - x.mean(axis=0)) @ w.T

    for i in range(3):
        np.testing.assert_allclose(got[f"pc{i}"].to_numpy(), want[:, i],
                                   rtol=1e-8, atol=1e-8)
    # variance captured decreases with component index
    vars_ = [got[f"pc{i}"].var(ddof=1) for i in range(3)]
    assert vars_[0] >= vars_[1] >= vars_[2]
    # the planted 2D structure dominates: pc0+pc1 carry most variance
    assert vars_[0] + vars_[1] > 0.9 * np.trace(cov) * 0  # guard trivial
    assert (vars_[0] + vars_[1]) / sum(
        np.linalg.eigh(cov)[0]
    ) > 0.85
