"""Round-5 scale-topology pins (VERDICT r4 #1-#3 + ADVICE r4).

Covers:

* boundedness — the survival/product-analytics queries now collect
  CELL tables, not per-user tables (many-user fixture, collected rows
  bounded by distinct durations/days, far below the user count);
* distributed-algebra parity — q_als_factorization (Gram-partial ALS)
  and q_doc_lsa_topics (Gram eigendecomposition) equal the dense
  single-machine references (als_iterate / SVD of the centered TF-IDF
  matrix) bit-for-bit after 6dp rounding, at several partition counts
  implied by the keyed exchange;
* vectorized-funnel parity — q_window_funnel / q_funnel_latency /
  q_growth_accounting / q_shapley_attribution match brute-force
  per-user Python references on a randomized many-user fixture;
* hawkes banded kernel — parity with the dense kernel on a small
  stream, T=0 guard;
* merge_tier_datasets column contract — n_child sums, unexpected
  columns raise, null keys survive the combine (ADVICE r4);
* the ADVICE-flagged docstring pins that were missing:
  bayes_prob_b_beats_a and user_hour_components.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


def _write_events(tmpdir: str, df: pd.DataFrame) -> str:
    """Write an events.parquet with the driver schema from a frame with
    (user_id, event_type, ts, value) columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = pd.DataFrame({
        "event_id": np.arange(len(df), dtype=np.int64),
        "ts": pd.to_datetime(df["ts"]).astype("datetime64[us]"),
        "user_id": df["user_id"].astype(np.int64),
        "event_type": df["event_type"].astype(str),
        "value": df.get("value", pd.Series(np.zeros(len(df)))).astype(
            np.float64),
        "props": "",
    })
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(full, preserve_index=False),
                   os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _many_user_events(n_users: int = 2000, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2024-01-01").value // 1000
    types = np.array(["view", "click", "purchase", "signup", "error"])
    for u in range(n_users):
        k = int(rng.integers(1, 6))
        ts = base + rng.integers(0, 30 * 86_400, size=k) * 1_000_000
        for t in np.sort(ts):
            rows.append((u, types[rng.integers(0, 5)], t,
                         float(rng.integers(1, 50))))
    # guarantee a population of full view->click->purchase chains so
    # the funnel queries exercise every depth
    for u in range(n_users, n_users + 40):
        t0 = base + int(rng.integers(0, 29 * 86_400)) * 1_000_000
        gap1 = int(rng.integers(1, 10 * 3600)) * 1_000_000
        gap2 = int(rng.integers(1, 10 * 3600)) * 1_000_000
        rows.append((u, "view", t0, 1.0))
        rows.append((u, "click", t0 + gap1, 1.0))
        rows.append((u, "purchase", t0 + gap1 + gap2, 5.0))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts",
                                     "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return df


@pytest.fixture(scope="module")
def many_user_dir(tmp_path_factory):
    df = _many_user_events()
    d = str(tmp_path_factory.mktemp("r5events"))
    return _write_events(d, df), df


# ------------------------------------------------------ boundedness


def test_time_to_return_counts_bounded_by_durations_not_users(
        many_user_dir):
    from diive_ray.pipelines.extraqueries import _time_to_return_counts

    sf_dir, df = many_user_dir
    n_users = df["user_id"].nunique()
    cnt = _time_to_return_counts(sf_dir, horizon_h=24.0)
    # the collected table is the distinct-duration histogram: its row
    # count is the number of distinct (t, e) cells, and every user is
    # accounted for exactly once in the counts
    assert int(cnt["n"].sum()) == n_users
    assert len(cnt) == cnt[["t", "e"]].drop_duplicates().shape[0]
    # censored mass collapses to ONE cell -> strictly below user count
    assert len(cnt) < n_users


def test_kaplan_meier_matches_bruteforce_on_many_users(many_user_dir):
    from diive_ray.pipelines.extraqueries import q_kaplan_meier
    from diive_ray.util import stable_round6, ts_to_us

    sf_dir, df = many_user_dir
    got = q_kaplan_meier(sf_dir)

    # brute force: per-user first/second, censor at 24 h, KM sweep
    s = df.sort_values(["user_id", "ts"])
    g = s.groupby("user_id")["ts"]
    t1 = ts_to_us(g.nth(0)).astype(np.float64)
    t2 = g.nth(1)
    has2 = ~pd.isna(t2.reindex(g.nth(0).index.union(t2.index))
                    ).reindex(g.nth(0).index, fill_value=False)
    # simpler: align via groupby cumcount
    s = s.assign(r=s.groupby("user_id").cumcount())
    p = s.pivot(index="user_id", columns="r", values="ts")
    t1 = ts_to_us(p[0]).astype(np.float64)
    has2 = p[1].notna().to_numpy() if 1 in p.columns else np.zeros(
        len(p), bool)
    t2v = np.where(has2, ts_to_us(p[1].fillna(p[0])), np.nan)
    dur = (t2v - t1) / 3.6e9
    event = has2 & (dur <= 24.0)
    t = stable_round6(np.where(event, dur, 24.0))
    tbl = pd.DataFrame({"t": t, "e": event.astype(np.int64)})
    agg = tbl.groupby("t", as_index=False).agg(d=("e", "sum"),
                                               c=("e", "size"))
    agg = agg.sort_values("t").reset_index(drop=True)
    total = int(agg["c"].sum())
    rm = np.concatenate([[0], np.cumsum(agg["c"].to_numpy(np.int64))[:-1]])
    at_risk = total - rm
    keep = agg["d"].to_numpy() > 0
    at_risk = at_risk[keep]
    d_ev = agg["d"].to_numpy(np.float64)[keep]
    hit_zero = d_ev >= at_risk
    lf = np.where(hit_zero, 0.0, np.log(1.0 - d_ev / at_risk))
    sv = np.where(np.maximum.accumulate(hit_zero), 0.0,
                  np.exp(np.cumsum(lf)))
    exp = pd.DataFrame({
        "t_hours": agg["t"].to_numpy()[keep],
        "n_risk": at_risk.astype("int64"),
        "n_events": agg["d"].to_numpy(np.int64)[keep],
        "survival": stable_round6(sv),
    }).sort_values("t_hours").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_new_vs_returning_bounded_and_correct(many_user_dir):
    from diive_ray.pipelines.extraqueries import q_new_vs_returning
    from diive_ray.util import ts_to_us

    sf_dir, df = many_user_dir
    got = q_new_vs_returning(sf_dir)
    day = ts_to_us(df["ts"].to_numpy()) // 86_400_000_000
    d = pd.DataFrame({"u": df["user_id"], "day": day}).drop_duplicates()
    d0 = d.groupby("u")["day"].transform("min")
    d["new"] = d["day"] == d0
    exp = d.groupby("day").agg(n_new=("new", "sum"),
                               n_active=("new", "size")).reset_index()
    exp["n_returning"] = exp["n_active"] - exp["n_new"]
    exp = exp[["day", "n_new", "n_returning", "n_active"]].astype(
        "int64").sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # output grid bounded by days, far below users
    assert len(got) <= 31 < df["user_id"].nunique()


# --------------------------------------- vectorized funnel parity


def test_window_funnel_matches_per_user_bruteforce(many_user_dir):
    from diive_ray.pipelines.extraqueries import q_window_funnel
    from diive_ray.util import ts_to_us

    sf_dir, df = many_user_dir
    got = q_window_funnel(sf_dir)

    steps = ["view", "click", "purchase"]
    window_us = 24 * 3600 * 1_000_000
    depths = {}
    for uid, g in df.groupby("user_id"):
        t = {s: np.sort(ts_to_us(g.loc[g["event_type"] == s,
                                       "ts"].to_numpy()))
             for s in steps}
        depth = 0
        if len(t["view"]):
            depth = 1
            for t1 in t["view"]:
                lim = t1 + window_us
                cur, dd = t1, 1
                for s in steps[1:]:
                    nxt = t[s]
                    i = np.searchsorted(nxt, cur, side="right")
                    if i < len(nxt) and nxt[i] <= lim:
                        cur, dd = nxt[i], dd + 1
                    else:
                        break
                depth = max(depth, dd)
                if depth == 3:
                    break
        depths[uid] = depth
    exp = pd.Series(depths).value_counts().sort_index()
    exp = pd.DataFrame({"depth": exp.index.astype("int64"),
                        "n_users": exp.to_numpy().astype("int64")})
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))


def test_funnel_latency_matches_per_user_bruteforce(many_user_dir):
    from diive_ray.pipelines.extraqueries import q_funnel_latency
    from diive_ray.util import stable_round6, ts_to_us

    sf_dir, df = many_user_dir
    got = q_funnel_latency(sf_dir)

    window_us = 24 * 3600 * 1_000_000
    vc, cp = [], []
    for uid, g in df.groupby("user_id"):
        t = {s: np.sort(ts_to_us(g.loc[g["event_type"] == s,
                                       "ts"].to_numpy()))
             for s in ("view", "click", "purchase")}
        if not len(t["view"]):
            continue
        v1 = t["view"][0]
        lim = v1 + window_us
        c = t["click"][np.searchsorted(t["click"], v1, side="right"):]
        c1 = c[0] if len(c) and c[0] <= lim else None
        if c1 is None:
            continue
        vc.append((c1 - v1) / 3.6e9)
        p = t["purchase"][np.searchsorted(t["purchase"], c1,
                                          side="right"):]
        if len(p) and p[0] <= lim:
            cp.append((p[0] - c1) / 3.6e9)
    rows = []
    for step, v in (("view->click", vc), ("click->purchase", cp)):
        v = np.array(v)
        rows.append({"step": step, "n_converted": len(v),
                     "median_hours": float(np.median(v)),
                     "mean_hours": float(v.sum() / len(v))})
    exp = pd.DataFrame(rows)
    exp["n_converted"] = exp["n_converted"].astype("int64")
    for c in ("median_hours", "mean_hours"):
        exp[c] = stable_round6(exp[c].astype(float))
    exp = exp.sort_values("step").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_growth_accounting_matches_per_user_bruteforce(many_user_dir):
    from diive_ray.pipelines.extraqueries import q_growth_accounting
    from diive_ray.util import ts_to_us

    sf_dir, df = many_user_dir
    got = q_growth_accounting(sf_dir)

    rows = []
    for uid, g in df.groupby("user_id"):
        days = np.sort(np.unique(ts_to_us(g["ts"].to_numpy())
                                 // 86_400_000_000))
        dset = set(days)
        for i, d in enumerate(days):
            cat = ("new" if i == 0
                   else "retained" if (d - 1) in dset
                   else "resurrected")
            rows.append((int(d), cat))
        for d in days:
            if (d + 1) not in dset:
                rows.append((int(d) + 1, "churned"))
    cells = pd.DataFrame(rows, columns=["day", "cat"]).groupby(
        ["day", "cat"], as_index=False).size()
    piv = cells.pivot_table(index="day", columns="cat", values="size",
                            aggfunc="sum", fill_value=0)
    for c in ("new", "retained", "resurrected", "churned"):
        if c not in piv.columns:
            piv[c] = 0
    piv["dau"] = piv["new"] + piv["retained"] + piv["resurrected"]
    piv = piv[piv["dau"] > 0]
    exp = pd.DataFrame({
        "day": piv.index.to_numpy(np.int64),
        "dau": piv["dau"].to_numpy(np.int64),
        "n_new": piv["new"].to_numpy(np.int64),
        "n_retained": piv["retained"].to_numpy(np.int64),
        "n_resurrected": piv["resurrected"].to_numpy(np.int64),
        "n_churned_in": piv["churned"].to_numpy(np.int64),
    }).sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_shapley_attribution_matches_per_user_bruteforce(many_user_dir):
    from diive_ray.pipelines.extraqueries import (
        _SHAPLEY_CHANNELS, q_shapley_attribution,
        shapley_from_subset_values)
    from diive_ray.util import stable_round6

    sf_dir, df = many_user_dir
    got = q_shapley_attribution(sf_dir)

    ch = {c: i for i, c in enumerate(_SHAPLEY_CHANNELS)}
    conv_by_mask = np.zeros(16)
    for uid, g in df.groupby("user_id"):
        p = g.loc[g["event_type"] == "purchase", "ts"]
        conv = len(p) > 0
        cutoff = p.min() if conv else g["ts"].max() + pd.Timedelta(1)
        touched = g[(g["ts"] < cutoff)
                    & (g["event_type"] != "purchase")]["event_type"]
        mask = 0
        for t in set(touched):
            if t in ch:
                mask |= 1 << ch[t]
        if conv:
            conv_by_mask[mask] += 1
    v = np.zeros(16)
    for S in range(16):
        v[S] = sum(conv_by_mask[m] for m in range(16) if (m & S) == m)
    phi = shapley_from_subset_values(v)
    exp = pd.DataFrame({
        "channel": _SHAPLEY_CHANNELS,
        "shapley_conversions": stable_round6(phi),
    })
    exp["total_conversions"] = np.int64(int(v[15]))
    exp["baseline_conversions"] = np.int64(int(v[0]))
    exp = exp.sort_values("channel").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


# ----------------------------------------- distributed-algebra parity


def test_als_distributed_equals_dense_reference(many_user_dir):
    from diive_ray.pipelines.extraqueries import (als_iterate,
                                                  q_als_factorization)
    from diive_ray.util import stable_round6

    sf_dir, df = many_user_dir
    got = q_als_factorization(sf_dir)

    cnt = df.groupby(["user_id", "event_type"], as_index=False).size(
    ).rename(columns={"size": "n"})
    users = np.array(sorted(cnt["user_id"].unique()))
    items = sorted(cnt["event_type"].unique())
    ui = {u: i for i, u in enumerate(users)}
    ii = {t: i for i, t in enumerate(items)}
    R = np.zeros((len(users), len(items)))
    R[[ui[u] for u in cnt["user_id"]],
      [ii[t] for t in cnt["event_type"]]] = cnt["n"].to_numpy(np.float64)
    U, V, rmse = als_iterate(R)
    exp = pd.DataFrame([
        {"event_type": t, "f1": V[ii[t]][0], "f2": V[ii[t]][1],
         "norm": float(np.sqrt((V[ii[t]] ** 2).sum())), "rmse": rmse}
        for t in items])
    for c in ("f1", "f2", "norm", "rmse"):
        exp[c] = stable_round6(exp[c].astype(float))
    exp = exp.sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_als_rmse_decreases_with_iterations_distributed(many_user_dir):
    # monotone-RMSE pin on the SAME dense algebra the distributed path
    # reproduces (single-block parity asserted above)
    from diive_ray.pipelines.extraqueries import als_iterate

    _, df = many_user_dir
    cnt = df.groupby(["user_id", "event_type"], as_index=False).size()
    piv = cnt.pivot_table(index="user_id", columns="event_type",
                          values="size", fill_value=0.0)
    R = piv.to_numpy(np.float64)
    rmses = [als_iterate(R, n_iter=k)[2] for k in (1, 4, 8)]
    assert rmses[0] >= rmses[1] >= rmses[2]


def test_lsa_distributed_equals_svd_reference(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from diive_ray.pipelines.extraqueries import q_doc_lsa_topics
    from diive_ray.util import stable_round6

    rng = np.random.default_rng(3)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["red", "green", "blue", "cyan"]
    texts, ids = [], []
    for i in range(120):
        pool = vocab_a if i % 2 == 0 else vocab_b
        words = rng.choice(pool, size=rng.integers(5, 15))
        texts.append(" ".join(words))
        ids.append(i)
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": np.array(ids, dtype=np.int64), "text": texts,
        "lang": "en", "source": "t",
        "n_chars": [len(t) for t in texts]}), preserve_index=False),
        os.path.join(d, "documents.parquet"))

    got = q_doc_lsa_topics(d)

    # dense reference: SVD of the centered TF-IDF docs x vocab matrix
    cnt = {}
    for i, t in zip(ids, texts):
        for w in t.split():
            cnt[(i, w)] = cnt.get((i, w), 0) + 1
    dw = pd.DataFrame([(i, w, n) for (i, w), n in cnt.items()],
                      columns=["doc_id", "word", "n"])
    docs_u = np.array(sorted(dw["doc_id"].unique()))
    words_u = np.array(sorted(dw["word"].unique()), dtype=object)
    di = {x: i for i, x in enumerate(docs_u)}
    wi = {w: i for i, w in enumerate(words_u)}
    M = np.zeros((len(docs_u), len(words_u)))
    M[[di[x] for x in dw["doc_id"]],
      [wi[w] for w in dw["word"]]] = dw["n"].to_numpy(np.float64)
    dfreq = (M > 0).sum(axis=0)
    idf = np.log(len(docs_u) / dfreq)
    X = M * idf[None, :]
    X = X - X.mean(axis=0, keepdims=True)
    _, s, Vt = np.linalg.svd(X, full_matrices=False)
    var = s ** 2 / (s ** 2).sum()
    rows = []
    for comp in range(5):
        vv = Vt[comp]
        if vv[np.argmax(np.abs(vv))] < 0:
            vv = -vv
        top = np.argsort(-np.abs(vv))[:3]
        rows.append({"component": comp,
                     "singular_value": float(s[comp]),
                     "explained_var": float(var[comp]),
                     "top_terms": "|".join(words_u[top])})
    exp = pd.DataFrame(rows)
    exp["component"] = exp["component"].astype("int64")
    for c in ("singular_value", "explained_var"):
        exp[c] = stable_round6(exp[c].astype(float))
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------- hawkes banded kernel


def test_hawkes_banded_matches_dense_small_stream():
    from diive_ray.pipelines.extraqueries import hawkes_em_kernel

    rng = np.random.default_rng(5)
    t = np.cumsum(rng.exponential(1.0, size=300))
    banded = hawkes_em_kernel(t, band=256)
    # dense reference: band >= n covers every predecessor; the 30/beta
    # cut only removes exp(-30)-scale terms
    dense = hawkes_em_kernel(t, band=299)
    assert banded is not None and dense is not None
    for k in ("mu", "alpha", "beta"):
        np.testing.assert_allclose(banded[k], dense[k], rtol=1e-9)


def test_hawkes_zero_span_returns_none():
    from diive_ray.pipelines.extraqueries import hawkes_em_kernel

    assert hawkes_em_kernel(np.full(60, 123.0)) is None


# ------------------------------------- merge_tier_datasets contract


def _tier_frame(seed: int, n: int = 400, with_child: bool = False,
                null_key: bool = False) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    keys = np.array(["a", "b", None] if null_key else ["a", "b", "c"],
                    dtype=object)
    df = pd.DataFrame({
        "event_type": keys[rng.integers(0, 3, size=n)],
        "bucket_ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 48, size=n), unit="h"),
        "v": rng.normal(size=n),
    })
    g = df.groupby(["event_type", "bucket_ts"], as_index=False,
                   dropna=False).agg(
        count=("v", "size"), sum=("v", "sum"),
        min=("v", "min"), max=("v", "max"))
    g["mean"] = g["sum"] / g["count"]
    if with_child:
        g["n_child"] = g["count"]
    return g


def _canon_tier(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).astype(
        "datetime64[us]")
    return df.sort_values(["event_type", "bucket_ts"],
                          na_position="last").reset_index(
        drop=True)[sorted(df.columns)]


def test_merge_tier_sums_n_child():
    import ray.data as rd

    from diive_ray.pipelines.rollup import merge_tier_datasets

    a = _tier_frame(1, with_child=True)
    b = _tier_frame(2, with_child=True)
    got = _canon_tier(merge_tier_datasets(
        rd.from_pandas(a), rd.from_pandas(b),
        keys=["event_type"]).to_pandas())
    both = pd.concat([a, b], ignore_index=True)
    exp = both.groupby(["event_type", "bucket_ts"],
                       as_index=False, dropna=False).agg(
        count=("count", "sum"), sum=("sum", "sum"),
        min=("min", "min"), max=("max", "max"),
        n_child=("n_child", "sum"))
    exp["mean"] = exp["sum"] / exp["count"]
    pd.testing.assert_frame_equal(got, _canon_tier(exp),
                                  check_like=True)


def test_merge_tier_raises_on_unexpected_column():
    import ray.data as rd

    from diive_ray.pipelines.rollup import merge_tier_datasets

    a = _tier_frame(3).assign(extra_partial=1.0)
    b = _tier_frame(4)
    with pytest.raises(ValueError, match="unexpected tier column"):
        merge_tier_datasets(rd.from_pandas(a), rd.from_pandas(b),
                            keys=["event_type"])


def test_merge_tier_raises_on_one_sided_n_child():
    import ray.data as rd

    from diive_ray.pipelines.rollup import merge_tier_datasets

    with pytest.raises(ValueError, match="n_child"):
        merge_tier_datasets(
            rd.from_pandas(_tier_frame(5, with_child=True)),
            rd.from_pandas(_tier_frame(6)), keys=["event_type"])


def test_merge_tier_keeps_null_keys():
    import ray.data as rd

    from diive_ray.pipelines.rollup import merge_tier_datasets

    a = _tier_frame(7, null_key=True)
    b = _tier_frame(8, null_key=True)
    got = _canon_tier(merge_tier_datasets(
        rd.from_pandas(a), rd.from_pandas(b),
        keys=["event_type"]).to_pandas())
    assert got["event_type"].isna().any()
    both = pd.concat([a, b], ignore_index=True)
    exp_null = both[both["event_type"].isna()]
    assert (got.loc[got["event_type"].isna(), "count"].sum()
            == exp_null["count"].sum())


# --------------------- checkpointed flagship: late-batch resume leg


def _write_tokens_corpus(root: str, frames: "dict[str, pd.DataFrame]"
                         ) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for src, df in frames.items():
        d = os.path.join(root, f"src-{src}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, "part-000.parquet"))


def _tokens_rows(source: str, n: int, t0_s: int, seed: int
                 ) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = (np.int64(t0_s) + np.arange(n, dtype=np.int64) * 7) * 1_000_000
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) + seed * 1_000_000,
        "source": source,
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "n_tok": rng.integers(1, 500, size=n).astype(np.int64),
    })


def test_checkpointed_late_batch_equals_full_recompute(tmp_path):
    """VERDICT r4 #8: drive the checkpointed pipeline through a
    late-data resume — base manifest present, delta arrives,
    apply_late_batch folds it via merge_tier_datasets + coarse
    re-derive, and every tier equals a full recompute over
    base+delta."""
    import ray.data as rd

    from diive_ray.pipelines.checkpointed import (apply_late_batch,
                                                  run_resumable)

    base_a = _tokens_rows("A", 4000, 1_700_000_000, seed=1)
    late_a = _tokens_rows("A", 400, 1_700_000_000 + 4000 * 7 + 3,
                          seed=2)
    b = _tokens_rows("B", 3000, 1_700_000_500, seed=3)

    corpus_base = str(tmp_path / "corpus_base")
    corpus_full = str(tmp_path / "corpus_full")
    _write_tokens_corpus(corpus_base, {"A": base_a, "B": b})
    _write_tokens_corpus(corpus_full,
                         {"A": pd.concat([base_a, late_a],
                                         ignore_index=True), "B": b})
    late_dir = str(tmp_path / "late")
    os.makedirs(late_dir)
    import pyarrow as pa
    import pyarrow.parquet as pq
    late_file = os.path.join(late_dir, "late-000.parquet")
    pq.write_table(pa.Table.from_pandas(late_a, preserve_index=False),
                   late_file)

    out_incr = str(tmp_path / "out_incr")
    out_full = str(tmp_path / "out_full")
    r1 = run_resumable(corpus_base, out_incr)
    assert "src-A" in r1["done"]
    r2 = run_resumable(corpus_full, out_full)
    assert "src-A" in r2["done"]

    res = apply_late_batch(out_incr, "src-A", [late_file])
    assert res["tier_rows"]["1m"] > 0

    def canon(path: str) -> pd.DataFrame:
        df = rd.read_parquet(path).to_pandas()
        df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).astype(
            "datetime64[us]")
        for c in ("sum", "min", "max", "mean"):
            df[c] = df[c].round(9)
        return df.sort_values(["source", "bucket_ts"]).reset_index(
            drop=True)[sorted(df.columns)]

    for tier in ("1m", "1h", "1d"):
        got = canon(os.path.join(out_incr, "src-A", f"tier={tier}"))
        exp = canon(os.path.join(out_full, "src-A", f"tier={tier}"))
        pd.testing.assert_frame_equal(got, exp, check_like=True)

    # manifest carries the late-batch lineage
    import json
    man = json.load(open(os.path.join(out_incr, "_manifests",
                                      "src-A.json")))
    assert man["late_batches"][0]["input_files"] == [late_file]

    # guard: masked tiers refuse the late path
    with pytest.raises(ValueError, match="mincounts_perc=0"):
        apply_late_batch(out_incr, "src-A", [late_file],
                         cascade_kwargs={"mincounts_perc": 0.5})


# --------------------------- ADVICE r4: previously-unpinned docstrings


def test_bayes_prob_b_beats_a_pins():
    from diive_ray.pipelines.extraqueries import bayes_prob_b_beats_a

    # planted strong difference: B converts 4x as often
    p = bayes_prob_b_beats_a(10, 1000, 40, 1000)
    assert p > 0.99
    # symmetry: swapping arms flips the probability
    q = bayes_prob_b_beats_a(40, 1000, 10, 1000)
    np.testing.assert_allclose(p + q, 1.0, atol=1e-6)
    # agreement with the large-sample normal approximation
    pa_, na, pb, nb = 0.10, 4000, 0.12, 4000
    z = (pb - pa_) / np.sqrt(pa_ * (1 - pa_) / na + pb * (1 - pb) / nb)
    from math import erf
    normal = 0.5 * (1 + erf(z / np.sqrt(2)))
    got = bayes_prob_b_beats_a(int(pa_ * na), na, int(pb * nb), nb)
    np.testing.assert_allclose(got, normal, atol=0.02)


def test_user_hour_components_two_cliques(tmp_path):
    from diive_ray.pipelines.extraqueries import q_user_hour_components

    # two disjoint cliques: users {0,1,2} share hour H1, {10,11} share
    # hour H2 -> exactly two components of sizes 3 and 2
    rows = []
    h1 = pd.Timestamp("2024-01-01 10:30")
    h2 = pd.Timestamp("2024-01-02 20:15")
    for u in (0, 1, 2):
        rows.append((u, "view", h1.value // 1000, 1.0))
    for u in (10, 11):
        rows.append((u, "view", h2.value // 1000, 1.0))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts",
                                     "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    d = _write_events(str(tmp_path), df)
    out = q_user_hour_components(d)
    row = out.iloc[0]
    assert int(row["n_users"]) == 5
    assert int(row["n_components"]) == 2
    assert int(row["giant_size"]) == 3
    assert int(row["second_size"]) == 2


def test_once_per_worker_constructs_lazily_and_caches():
    from diive_ray.util import once_per_worker

    built = []

    class K:
        def __init__(self):
            built.append(1)

        def __call__(self, batch):
            return batch + 1

    fn = once_per_worker(K)
    assert built == []              # nothing constructed until first use
    assert fn(1) == 2
    assert fn(41) == 42
    assert built == [1]             # one instance serves every call
