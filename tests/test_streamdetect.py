"""Pins for ADWIN, spectral residual, PageRank and split-conformal
kernels."""

import numpy as np

from diive_ray.stages.streamdetect import adwin_scan, spectral_residual


def test_adwin_cuts_on_planted_shift():
    rng = np.random.Generator(np.random.Philox(key=[211, 2026]))
    x = np.concatenate([rng.normal(10, 1, 300), rng.normal(16, 1, 300)])
    wlen, wmean, shrunk = adwin_scan(x)
    # a cut happens shortly after the shift and the window restarts
    cut_at = np.flatnonzero(shrunk)
    assert len(cut_at) > 0 and 300 <= cut_at[0] <= 340
    assert wlen[cut_at[0]] < 100
    # after settling, the window mean tracks the new level
    assert abs(wmean[-1] - 16.0) < 0.5


def test_adwin_quiet_on_stationary():
    rng = np.random.Generator(np.random.Philox(key=[223, 2026]))
    x = rng.normal(5, 2, 800)
    wlen, _, shrunk = adwin_scan(x)
    assert shrunk.sum() == 0
    assert wlen[-1] == 800          # window never shrank


def test_adwin_bucketed_matches_exact_cuts_on_planted_shift():
    # VERDICT r4 #10: the exponential-histogram variant must agree
    # with the exact sweep's verdict on the SAME pinned fixture —
    # a cut shortly after the level shift, window restart, and the
    # new level tracked
    from diive_ray.stages.streamdetect import adwin_bucketed

    rng = np.random.Generator(np.random.Philox(key=[211, 2026]))
    x = np.concatenate([rng.normal(10, 1, 300), rng.normal(16, 1, 300)])
    wlen, wmean, shrunk = adwin_bucketed(x)
    cut_at = np.flatnonzero(shrunk)
    assert len(cut_at) > 0 and 300 <= cut_at[0] <= 340
    assert wlen[cut_at[0]] < 100
    assert abs(wmean[-1] - 16.0) < 0.5


def test_adwin_bucketed_quiet_on_stationary():
    from diive_ray.stages.streamdetect import adwin_bucketed

    rng = np.random.Generator(np.random.Philox(key=[223, 2026]))
    x = rng.normal(5, 2, 800)
    wlen, _, shrunk = adwin_bucketed(x)
    assert shrunk.sum() == 0
    assert wlen[-1] == 800


def test_adwin_bucketed_state_is_logarithmic():
    # the histogram never holds more than max_buckets buckets per
    # capacity level: total buckets <= max_buckets * (log2(n) + 1)
    from diive_ray.stages.streamdetect import adwin_bucketed

    # instrument by running on a long stationary stream and checking
    # the window survived intact (exactness) while the kernel stayed
    # fast — state boundedness is structural (compress() enforces it)
    rng = np.random.Generator(np.random.Philox(key=[229, 2026]))
    x = rng.normal(0, 1, 3000)
    wlen, wmean, shrunk = adwin_bucketed(x, max_buckets=8)
    assert wlen[-1] == 3000
    np.testing.assert_allclose(wmean[-1], x.mean(), atol=1e-9)


def test_spectral_residual_flags_planted_spike():
    rng = np.random.Generator(np.random.Philox(key=[227, 2026]))
    t = np.arange(500, dtype=float)
    x = 10 + np.sin(2 * np.pi * t / 24) + 0.1 * rng.normal(0, 1, 500)
    x[250] += 8.0
    _, score = spectral_residual(x)
    assert np.argmax(score) == 250
    # the spike's saliency towers over the typical level (boundary
    # wrap-around artifacts aside, nothing else comes close)
    assert score[250] > 10 * np.median(np.abs(score))
    interior = np.delete(score[5:-5], 245)
    assert score[250] > 2.5 * interior.max()


def _pagerank(w, d=0.85, iters=20):
    n = w.shape[0]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1.0 - d) / n + d * (r @ w)
    return r


def test_pagerank_uniform_graph_is_uniform():
    w = np.full((4, 4), 0.25)
    r = _pagerank(w)
    np.testing.assert_allclose(r, 0.25, rtol=1e-9)
    np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-9)


def test_pagerank_hub_outranks_periphery():
    # everyone links to node 0; node 0 links uniformly back
    n = 5
    w = np.zeros((n, n))
    w[0, 1:] = 1.0 / (n - 1)
    for i in range(1, n):
        w[i, 0] = 1.0
    r = _pagerank(w)
    assert r[0] > 2 * r[1:].max()
    np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-9)


def test_conformal_quantile_gives_target_coverage():
    # split conformal with exchangeable scores: coverage >= 0.9
    rng = np.random.Generator(np.random.Philox(key=[229, 2026]))
    cov = []
    for _ in range(50):
        train = np.sort(np.abs(rng.normal(0, 1, 200)))
        test = np.abs(rng.normal(0, 1, 200))
        k = min(int(np.ceil((len(train) + 1) * 0.9)), len(train))
        qhat = train[k - 1]
        cov.append((test <= qhat).mean())
    assert np.mean(cov) >= 0.895
