"""Quality-weighted STL (reference decomposition_utils.py:318-364
quality_weighted_decompose: quality flags enter the fit, not a
pre-filter) — stages/decompose.py:stl_decompose_frame(weights=...)."""

import numpy as np
import pandas as pd

from diive_ray.stages.decompose import stl_decompose_frame


def _contaminated():
    rng = np.random.default_rng(6)
    t = np.arange(480, dtype=float)
    clean = 10 + 0.01 * t + 5 * np.sin(2 * np.pi * t / 24)
    y = clean + rng.normal(0, 0.3, 480)
    bad = rng.choice(480, size=24, replace=False)
    y[bad] += rng.choice([-40.0, 40.0], size=24)
    q = np.ones(480)
    q[bad] = 0.0
    return pd.DataFrame({"v": y}), clean, q


def test_quality_weights_suppress_flagged_outliers():
    df, clean, q = _contaminated()
    plain = stl_decompose_frame(df, "v", period=24)
    weighted = stl_decompose_frame(df, "v", period=24, weights=q)
    err_plain = np.sqrt(((plain["v_trend"] + plain["v_seasonal"]
                          - clean) ** 2).mean())
    err_w = np.sqrt(((weighted["v_trend"] + weighted["v_seasonal"]
                      - clean) ** 2).mean())
    assert err_w < err_plain / 2


def test_none_weights_bit_identical_to_unweighted():
    df, _, _ = _contaminated()
    a = stl_decompose_frame(df, "v", period=24)
    b = stl_decompose_frame(df, "v", period=24, weights=None)
    for c in ("v_trend", "v_seasonal", "v_resid"):
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_all_ones_weights_match_unweighted_inner_pass():
    # uniform full-quality weights must not change the fit
    df, _, _ = _contaminated()
    a = stl_decompose_frame(df, "v", period=24)
    b = stl_decompose_frame(df, "v", period=24,
                            weights=np.ones(len(df)))
    assert np.allclose(a["v_trend"], b["v_trend"], atol=1e-9)
    assert np.allclose(a["v_seasonal"], b["v_seasonal"], atol=1e-9)


def test_weights_compose_with_robust_outer_loop():
    df, clean, q = _contaminated()
    r = stl_decompose_frame(df, "v", period=24, robust=True,
                            n_outer=3, weights=q)
    err = np.sqrt(((r["v_trend"] + r["v_seasonal"] - clean) ** 2).mean())
    plain = stl_decompose_frame(df, "v", period=24)
    err_plain = np.sqrt(((plain["v_trend"] + plain["v_seasonal"]
                          - clean) ** 2).mean())
    assert err < err_plain
