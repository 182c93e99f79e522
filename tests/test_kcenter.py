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
