"""k-center greedy coreset pins: planted-cluster recovery, radius
sequence monotonicity, determinism across partitionings, and the
farthest-point invariant vs a literal reference implementation."""

import numpy as np
import pandas as pd


def _clustered_ds(n_per=40, seed=7):
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=[seed, 2026]))
    cents = np.array([[10, 0, 0], [0, 10, 0], [0, 0, 10], [-10, -10, 0]], dtype=float)
    rows = []
    vid = 0
    for c in cents:
        for _ in range(n_per):
            rows.append((vid, (c + rng.normal(0, 0.3, 3)).tolist()))
            vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return rd.from_pandas(df), df


def _reference_greedy(df, k, normalize):
    x = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    if normalize:
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    sel = [int(ids.argmin())]
    dists = [0.0]
    mind = ((x - x[sel[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        order = np.lexsort((ids, -mind))
        i = int(order[0])
        sel.append(i)
        dists.append(float(np.sqrt(mind[i])))
        mind = np.minimum(mind, ((x - x[i]) ** 2).sum(axis=1))
    return ids[sel].tolist(), dists


def test_kcenter_covers_planted_clusters(ray_session):
    from diive_ray.stages.similarity import kcenter_greedy

    ds, df = _clustered_ds()
    out = kcenter_greedy(ds, k=4, normalize=False)
    # the 4 selected points hit all 4 planted clusters (one per 40-block)
    assert sorted(set(out["vec_id"] // 40)) == [0, 1, 2, 3]
    # coverage radius sequence is weakly decreasing after the seed row
    d = out["dist"].to_numpy()[1:]
    assert (np.diff(d) <= 1e-12).all()


def test_kcenter_matches_reference_and_partitioning(ray_session):
    from diive_ray.stages.similarity import kcenter_greedy

    ds, df = _clustered_ds(n_per=25, seed=13)
    exp_ids, exp_d = _reference_greedy(df, 6, normalize=False)
    a = kcenter_greedy(ds.repartition(3), k=6, normalize=False)
    b = kcenter_greedy(ds.repartition(11), k=6, normalize=False)
    assert a["vec_id"].tolist() == exp_ids == b["vec_id"].tolist()
    np.testing.assert_allclose(a["dist"].to_numpy(), exp_d, atol=1e-9)
    pd.testing.assert_frame_equal(a, b)


# -------------------------------------------------- neyman_sample
# (appended here: sampling/selection family shares this module)


def test_neyman_allocation_exact_integers(ray_session):
    """Hand-workable strata: stratum A values constant (sigma = 0 ->
    no allocation), B and C with chosen exact moments; allocation must
    equal total * floor(sqrt(n*s2 - s1^2)) // W."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from diive_ray.stages.packing import neyman_sample

    rows = []
    # A: 10 docs, constant 7 -> S2 = 0
    for i in range(10):
        rows.append(("A", i, 7))
    # B: 20 docs alternating 10/30 -> n=20 s1=400 s2=20*(100+900)/2*2...
    for i in range(20):
        rows.append(("B", 100 + i, 10 if i % 2 == 0 else 30))
    # C: 40 docs alternating 5/6
    for i in range(40):
        rows.append(("C", 200 + i, 5 if i % 2 == 0 else 6))
    df = pd.DataFrame(rows, columns=["source", "doc_id", "n_chars"])
    ds = rd.from_pandas(df).repartition(5)
    out = neyman_sample(ds, total=30, strat_col="source",
                        var_col="n_chars", id_col="doc_id")

    def w(g):
        x = df[df.source == g]["n_chars"].to_numpy(dtype=np.int64)
        s2 = len(x) * int((x * x).sum()) - int(x.sum()) ** 2
        return math.floor(math.sqrt(s2))

    W = w("A") + w("B") + w("C")
    sizes = {"A": 10, "B": 20, "C": 40}
    # selection caps at stratum size when the allocation overshoots
    expect = {g: min((30 * w(g)) // W, sizes[g]) for g in "ABC"}
    assert expect["A"] == 0
    got = out.groupby("source")["rk"].max().to_dict()
    for g in "BC":
        assert got[g] == expect[g], (g, got, expect)
    assert "A" not in got
    assert len(out) == sum(expect.values())
    # selection = the alloc smallest Knuth hashes per stratum
    h = (df["doc_id"].to_numpy(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    df2 = df.assign(h=h.astype(np.int64))
    for g in "BC":
        exp_ids = (df2[df2.source == g].sort_values(["h", "doc_id"])
                   .head(expect[g])["doc_id"].tolist())
        assert sorted(out[out.source == g]["doc_id"]) == sorted(exp_ids)
    # over-allocated stratum B keeps its full population
    assert expect["B"] == sizes["B"]


def test_neyman_partitioning_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from diive_ray.stages.packing import neyman_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "source": rng.choice(["x", "y", "z"], size=300),
        "doc_id": np.arange(300, dtype=np.int64),
        "n_chars": rng.integers(10, 500, size=300),
    })
    a = neyman_sample(rd.from_pandas(df).repartition(1), total=50)
    b = neyman_sample(rd.from_pandas(df).repartition(13), total=50)
    pd.testing.assert_frame_equal(a, b)
