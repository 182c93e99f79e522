"""Distributed ASOF join + sessionization (stages/joins.py) vs
single-frame pandas oracles, including one-sided keys, tolerance,
forward direction, dtype restoration and timeout edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.joins import asof_join, session_stats, sessionize, sessionize_frame

US = 1_000_000


@pytest.fixture(scope="module")
def sides():
    """Left: 400 irregular points over 6 keys (2 keys missing on the
    right); right: sparse reference rows per key, unique (key, ts)."""
    rng = np.random.Generator(np.random.Philox(key=7))
    n = 400
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.choice(list("abcdef"), size=n),
            "ts": base + pd.to_timedelta(rng.integers(0, 86_400 * 10, size=n), unit="s"),
            "x": rng.normal(size=n),
        }
    )
    left["ts"] = left["ts"].astype("datetime64[us]")
    rr = []
    for k in "abcd":  # e, f absent on the right
        for h in range(0, 240, int(rng.integers(3, 9))):
            rr.append((k, base + pd.Timedelta(hours=h), float(h)))
    right = pd.DataFrame(rr, columns=["k", "ts", "ref"]).drop_duplicates(["k", "ts"])
    right["ts"] = right["ts"].astype("datetime64[us]")
    return left, right


def _oracle(left, right, direction="backward", tolerance=None):
    l = left.sort_values("ts", kind="mergesort", ignore_index=True)
    r = right.sort_values("ts", kind="mergesort", ignore_index=True)
    out = pd.merge_asof(l, r, on="ts", by="k", direction=direction, tolerance=tolerance)
    return out.sort_values("rid", ignore_index=True)


def _run(left, right, **kw):
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", on="ts", **kw
    ).to_pandas()
    return out.sort_values("rid", ignore_index=True)


def test_asof_backward_matches_pandas(sides):
    left, right = sides
    got, exp = _run(left, right), _oracle(left, right)
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert got["rid"].dtype == np.int64  # restored through the union
    # keys with no right side must survive with null ref
    assert got.loc[got["k"].isin(["e", "f"]), "ref"].isna().all()


def test_asof_forward_and_tolerance(sides):
    left, right = sides
    tol = pd.Timedelta(hours=2)
    for direction in ("forward", "backward"):
        got = _run(left, right, direction=direction, tolerance=tol)
        exp = _oracle(left, right, direction=direction, tolerance=tol)
        pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_asof_rejects_clashing_value_columns(sides):
    left, right = sides
    bad = right.rename(columns={"ref": "x"})
    with pytest.raises(ValueError, match="clash"):
        asof_join(rd.from_pandas(left), rd.from_pandas(bad), key="k", on="ts")


def test_sessionize_frame_boundaries():
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 01:00",
         "2024-01-01 02:00", "2024-01-01 02:59", "2024-01-01 04:00"]
    ).astype("datetime64[us]")
    df = pd.DataFrame({"k": ["a"] * 6, "ts": ts})
    # timeout exactly 30 min: gap == timeout stays, gap > timeout splits
    out = sessionize_frame(df, key="k", ts="ts", timeout_us=30 * 60 * US)
    assert out["session_id"].tolist() == [1, 1, 1, 2, 3, 4]
    # ties share a session regardless of order
    df2 = pd.DataFrame({"k": ["a", "a"], "ts": [ts[0], ts[0]]})
    out2 = sessionize_frame(df2, key="k", ts="ts", timeout_us=1)
    assert out2["session_id"].tolist() == [1, 1]


def test_session_stats_vs_pandas(sides):
    left, _ = sides
    timeout_us = 4 * 3600 * US
    got = (
        session_stats(rd.from_pandas(left), key="k", ts="ts", timeout_us=timeout_us)
        .to_pandas()
        .sort_values(["k", "session_id"], ignore_index=True)
    )
    lab = sessionize_frame(left, key="k", ts="ts", timeout_us=timeout_us)
    exp = (
        lab.groupby(["k", "session_id"], sort=False)["ts"]
        .agg(session_start="min", session_end="max", n_events="size")
        .reset_index()
        .sort_values(["k", "session_id"], ignore_index=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert (got["session_start"].to_numpy() == exp["session_start"].to_numpy()).all()
    assert (got["session_end"].to_numpy() == exp["session_end"].to_numpy()).all()
    dur = (got["session_end"] - got["session_start"]).dt.total_seconds().astype(np.int64)
    assert got["duration_s"].tolist() == dur.tolist()
    # distributed labeling agrees with the single-frame kernel
    got_rows = (
        sessionize(rd.from_pandas(left), key="k", ts="ts", timeout_us=timeout_us)
        .to_pandas()
        .sort_values(["k", "ts", "rid"], ignore_index=True)
    )
    exp_rows = lab.sort_values(["k", "ts", "rid"], ignore_index=True)
    assert got_rows["session_id"].tolist() == exp_rows["session_id"].tolist()


# ------------------------------------------------------------------ funnel


def _funnel_brute(df, steps, window_us=None):
    """Per-user chained-minima reference in plain python."""
    reached = [0] * len(steps)
    for _, g in df.groupby("u"):
        g = g.sort_values("us")
        s1 = g[g["ev"] == steps[0]]["us"]
        if s1.empty:
            continue
        t1 = prev = int(s1.min())
        reached[0] += 1
        for i, step in enumerate(steps[1:], start=1):
            cand = g[(g["ev"] == step) & (g["us"] > prev)]
            if window_us is not None:
                cand = cand[cand["us"] <= t1 + window_us]
            if cand.empty:
                break
            prev = int(cand["us"].min())
            reached[i] += 1
    return reached


def test_funnel_counts_vs_brute(ray_session):
    from diive_ray.stages.joins import funnel_counts

    rng = np.random.default_rng(17)
    n = 6000
    df = pd.DataFrame({
        "u": rng.integers(0, 120, n),
        "ev": rng.choice(["view", "click", "purchase", "noise"], n),
        "us": rng.integers(0, 30 * 86_400_000_000, n),
    })
    df["ts"] = pd.to_datetime(df["us"], unit="us")
    steps = ["view", "click", "purchase"]
    for window in (None, 86_400_000_000):
        exp = _funnel_brute(df, steps, window)
        got = funnel_counts(
            rd.from_pandas(df[["u", "ev", "ts"]]).repartition(5),
            steps=steps, key="u", ts="ts", event_col="ev", window_us=window,
        )
        assert got["n_users"].tolist() == exp, (window, got, exp)


def test_funnel_strictly_after_and_window_edges(ray_session):
    """Same-timestamp step-2 event does NOT count (strictly after);
    an event exactly AT t1+window does (<=)."""
    from diive_ray.stages.joins import funnel_counts

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "u": [1, 1, 2, 2, 3, 3],
        "ev": ["view", "click"] * 3,
        "ts": [base, base,                                   # u1: tie -> no click
               base, base + pd.Timedelta(hours=24),          # u2: exactly at window edge -> counts
               base, base + pd.Timedelta(hours=24, seconds=1)],  # u3: past window -> no
    })
    got = funnel_counts(
        rd.from_pandas(df), steps=["view", "click"],
        key="u", ts="ts", event_col="ev", window_us=24 * 3600 * 1_000_000,
    )
    assert got["n_users"].tolist() == [3, 1]


def test_event_transitions_vs_pandas(ray_session):
    from diive_ray.stages.joins import event_transitions

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n),
        "ev": rng.choice(list("abcd"), n),
        "ts": pd.to_datetime(rng.integers(0, 10 * 86_400_000_000, n), unit="us"),
        "eid": np.arange(n, dtype=np.int64),
    })
    got = event_transitions(
        rd.from_pandas(df).repartition(5),
        key="u", ts="ts", event_col="ev", order_col="eid",
    )
    ref = df.sort_values(["u", "ts", "eid"])
    prev = ref.groupby("u")["ev"].shift(1)
    pairs = pd.DataFrame({"prev_event": prev, "next_event": ref["ev"]}).dropna()
    exp = pairs.groupby(["prev_event", "next_event"], as_index=False).size() \
               .rename(columns={"size": "n"}).sort_values(["prev_event", "next_event"])
    assert got["n"].tolist() == exp["n"].tolist()
    tot = exp.groupby("prev_event")["n"].transform("sum")
    assert np.allclose(got["p"].to_numpy(), (exp["n"] / tot).round(6).to_numpy())
