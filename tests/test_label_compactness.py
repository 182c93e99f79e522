"""label_compactness pins: naive-numpy equivalence, tight-vs-loose
cluster ordering, and partitioning invariance of the two-pass
centroid/cosine plan."""

import numpy as np
import pandas as pd


def _labeled_ds(n_per=50, spread=(0.2, 3.0), seed=9, parallelism=1):
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=[seed, 2026]))
    cents = np.array([[8, 0, 0, 0], [0, 8, 0, 0]], dtype=float)
    rows = []
    for lab, (c, sd) in enumerate(zip(cents, spread)):
        for _ in range(n_per):
            rows.append((lab, (c + rng.normal(0, sd, 4)).tolist()))
    df = pd.DataFrame(rows, columns=["label", "embedding"])
    ds = rd.from_pandas(df)
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    return ds, df


def _naive(df):
    out = []
    for lab, g in df.groupby("label"):
        x = np.stack([np.asarray(v, float) for v in g["embedding"]])
        c = x.mean(axis=0)
        cn = np.linalg.norm(c)
        cos = (x @ c) / (np.linalg.norm(x, axis=1) * cn)
        out.append((lab, len(g), cn, cos.mean(), cos.min()))
    return pd.DataFrame(
        out, columns=["label", "n", "centroid_norm", "mean_cos", "min_cos"]
    ).sort_values("label").reset_index(drop=True)


def test_matches_naive_numpy():
    from diive_ray.stages.similarity import label_compactness

    ds, df = _labeled_ds()
    got = label_compactness(ds)
    exp = _naive(df)
    assert got["label"].tolist() == exp["label"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    for c in ("centroid_norm", "mean_cos", "min_cos"):
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-12)


def test_tight_cluster_more_compact():
    from diive_ray.stages.similarity import label_compactness

    ds, _ = _labeled_ds(spread=(0.2, 3.0))
    out = label_compactness(ds).set_index("label")
    assert out.loc[0, "mean_cos"] > out.loc[1, "mean_cos"]
    assert out.loc[0, "min_cos"] > out.loc[1, "min_cos"]
    assert out.loc[0, "mean_cos"] > 0.995    # tight cluster ~ 1


def test_partitioning_invariant():
    from diive_ray.stages.similarity import label_compactness

    ds1, _ = _labeled_ds(parallelism=1)
    ds8, _ = _labeled_ds(parallelism=8)
    a = label_compactness(ds1)
    b = label_compactness(ds8)
    for c in ("centroid_norm", "mean_cos", "min_cos"):
        np.testing.assert_allclose(a[c], b[c], atol=1e-9)
    assert a["n"].tolist() == b["n"].tolist()
