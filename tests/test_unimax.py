"""UniMax waterfilling allocation (docqueries.py:unimax_alloc,
Chung et al. 2023)."""

import numpy as np

from diive_ray.pipelines.docqueries import unimax_alloc


def test_unimax_hand_worked():
    # sizes 10, 20, 1000; budget 300; cap 3:
    #   k=1: 3*10*3 = 90 <= 300            -> capped (alloc 30)
    #   k=2: 3*20*2 = 120 <= 270           -> capped (alloc 60)
    #   k=3: 3*1000*1 = 3000 > 210         -> uncapped, gets 210
    n = np.array([10.0, 20.0, 1000.0])
    alloc, k_cap = unimax_alloc(n, budget=300.0, cap=3.0)
    assert k_cap == 2
    assert np.allclose(alloc, [30.0, 60.0, 210.0])
    assert alloc.sum() == 300.0


def test_unimax_budget_exhausted_exactly():
    # budget always fully spent when uncapped sources exist
    rng = np.random.default_rng(1)
    n = np.sort(rng.integers(100, 10_000, size=12).astype(float))
    budget = 0.5 * n.sum()
    alloc, k_cap = unimax_alloc(n, budget=budget, cap=3.0)
    assert abs(alloc.sum() - budget) < 1e-6
    # capped sources get exactly cap epochs; uncapped get fewer
    eps = alloc / n
    assert np.allclose(eps[:k_cap], 3.0)
    assert (eps[k_cap:] < 3.0).all()
    # uncapped allocations are all equal (uniform share)
    if k_cap < len(n):
        assert np.ptp(alloc[k_cap:]) == 0.0


def test_unimax_huge_budget_caps_everyone():
    n = np.array([5.0, 7.0, 9.0])
    alloc, k_cap = unimax_alloc(n, budget=1e9, cap=2.0)
    assert k_cap == 3
    assert np.allclose(alloc, 2.0 * n)


def test_unimax_fairness_property():
    # the defining UniMax property: no uncapped source receives more
    # than cap epochs, and every uncapped source receives the same
    # token budget regardless of its size
    n = np.array([100.0, 200.0, 50_000.0, 80_000.0])
    alloc, k_cap = unimax_alloc(n, budget=0.3 * n.sum(), cap=3.0)
    assert k_cap == 2
    assert alloc[2] == alloc[3]
    assert alloc[2] / n[2] < 3.0
