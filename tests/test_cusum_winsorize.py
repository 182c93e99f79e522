"""CUSUM closed form vs the literal Page recursion (the prefix-min
identity the exact oracle relies on), planted level-shift detection,
and winsorize clip-rule sanity."""

import numpy as np


def _closed_form(x, mu0, slack):
    d = x - mu0 - slack
    prefix = np.cumsum(d)
    run_min = np.minimum(np.minimum.accumulate(prefix), 0.0)
    return prefix - run_min


def _recursion(x, mu0, slack):
    s = np.zeros(len(x))
    acc = 0.0
    for i, v in enumerate(x):
        acc = max(0.0, acc + (v - mu0 - slack))
        s[i] = acc
    return s


def test_closed_form_equals_recursion():
    rng = np.random.Generator(np.random.Philox(key=[71, 2026]))
    for _ in range(20):
        x = rng.normal(10, 3, size=rng.integers(5, 400))
        a = _closed_form(x, 10.0, 0.5)
        b = _recursion(x, 10.0, 0.5)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)
        assert (a >= 0).all()


def test_planted_level_shift_alarms():
    rng = np.random.Generator(np.random.Philox(key=[73, 2026]))
    x = np.concatenate([rng.normal(10, 1, 300), rng.normal(14, 1, 100)])
    s = _closed_form(x, 10.0, 0.5)
    assert (s[:280] > 25.0).sum() == 0       # quiet before the shift
    assert (s[320:] > 25.0).all()            # latched after it


def test_winsorize_clip_rules():
    rng = np.random.Generator(np.random.Philox(key=[79, 2026]))
    v = rng.normal(50, 10, 1000)
    lo, hi = np.quantile(v, 0.05), np.quantile(v, 0.95)
    w = np.clip(v, lo, hi)
    assert w.min() == lo and w.max() == hi
    assert (v < lo).sum() + (v > hi).sum() == (w != v).sum()
    # clipping pulls tails in: winsorized SD strictly smaller
    assert w.std() < v.std()


# --------------------------- keyed_quantile_cont (de-skewed winsorize)


def test_keyed_quantile_cont_matches_pandas():
    import pandas as pd
    import ray.data as rd

    from diive_ray.stages.stratified import keyed_quantile_cont

    rng = np.random.Generator(np.random.Philox(key=[83, 2026]))
    keys = rng.choice(np.array(["a", "b", "c"]), size=3000)
    v = rng.normal(20, 5, size=3000)
    v[rng.choice(3000, 50, replace=False)] = np.nan
    df = pd.DataFrame({"k": keys, "v": v})
    got = keyed_quantile_cont(
        rd.from_pandas(df).repartition(7), "k", "v", [0.05, 0.5, 0.95]
    )
    for k in "abc":
        sub = df[df["k"] == k]["v"].dropna()
        for q in (0.05, 0.5, 0.95):
            want = float(sub.quantile(q))
            have = float(
                got[(got["k"] == k) & (got["q"] == q)]["value"].iloc[0]
            )
            np.testing.assert_allclose(have, want, rtol=0, atol=1e-12)


def test_keyed_quantile_hot_key_no_oversized_block():
    """One key = 90% of rows (the skewed-key scale-killer VERDICT r3 #4
    targets): the streaming plan must complete with bounded collections
    and match pandas exactly. collect_cap is set BELOW the hot key's row
    count — a plan that shipped whole keys anywhere would blow it."""
    import pandas as pd
    import ray.data as rd

    from diive_ray.stages.stratified import keyed_quantile_cont

    rng = np.random.Generator(np.random.Philox(key=[89, 2026]))
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, "hot", "cold")
    v = rng.normal(0, 1, size=n)
    df = pd.DataFrame({"k": keys, "v": v})
    got = keyed_quantile_cont(
        rd.from_pandas(df).repartition(13), "k", "v", [0.05, 0.95],
        collect_cap=2_000,
    )
    for k in ("hot", "cold"):
        sub = df[df["k"] == k]["v"]
        for q in (0.05, 0.95):
            want = float(sub.quantile(q))
            have = float(got[(got["k"] == k) & (got["q"] == q)]["value"].iloc[0])
            np.testing.assert_allclose(have, want, rtol=0, atol=1e-12)


def test_keyed_quantile_duplicate_heavy_cap_raises():
    import pandas as pd
    import pytest
    import ray.data as rd

    from diive_ray.stages.stratified import keyed_quantile_cont

    df = pd.DataFrame({"k": ["x"] * 5000, "v": np.zeros(5000)})
    with pytest.raises(RuntimeError, match="duplicate class"):
        keyed_quantile_cont(rd.from_pandas(df), "k", "v", [0.5], collect_cap=100)
