"""DBSCAN over embeddings (stages/cluster.py:dbscan_embeddings,
Ester et al. 1996): planted-cluster recovery, border/noise semantics,
partitioning invariance, and the FP-safety margin the exact SQL oracle
relies on."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from diive_ray.stages.cluster import dbscan_embeddings, euclidean_pairs_within


def _ds(V: np.ndarray, ids=None, parallelism=4) -> rd.Dataset:
    n = len(V)
    return rd.from_pandas(pd.DataFrame({
        "vec_id": ids if ids is not None else np.arange(n, dtype=np.int64),
        "embedding": list(V.astype(np.float32)),
    })).repartition(parallelism)


def _blobs():
    """Two tight 3-point-plus clusters + two isolated noise points in
    2-D; eps2 = 1.0, min_pts = 3."""
    a = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [0.9, 0.9]])   # ids 0-3
    b = np.array([[10.0, 10.0], [10.5, 10.0], [10.0, 10.5]])          # ids 4-6
    noise = np.array([[50.0, 50.0], [-50.0, 20.0]])                   # ids 7-8
    return np.vstack([a, b, noise])


def test_dbscan_planted_clusters(ray_session):
    out = (
        dbscan_embeddings(_ds(_blobs()), eps2=1.0, min_pts=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # cluster A: 0,1,2 mutually within eps (cores); 3 is within eps of
    # nothing but... check: dist(3, 1) = sqrt(0.16+0.81)=0.985 < 1 so
    # d2 = 0.97 <= 1.0 -> 3 neighbors of 1? recompute: it borders 1&2.
    roles = dict(zip(out["vec_id"], out["role"]))
    clusters = dict(zip(out["vec_id"], out["cluster"]))
    assert roles[0] == "core" and roles[1] == "core" and roles[2] == "core"
    assert clusters[0] == clusters[1] == clusters[2] == 0
    assert roles[4] == roles[5] == roles[6] == "core"
    assert clusters[4] == clusters[5] == clusters[6] == 4
    assert roles[7] == "noise" and clusters[7] == -1
    assert roles[8] == "noise" and clusters[8] == -1
    # id 3: dist2 to 1 = 0.16+0.81 = 0.97 <= 1, to 2 = 0.81+0.16 <= 1,
    # to 0 = 1.62 > 1 -> 2 neighbors + self = 3 >= min_pts -> core too
    assert roles[3] == "core" and clusters[3] == 0


def test_dbscan_border_min_id_rule(ray_session):
    """A point within eps of cores from ONE cluster but itself
    non-core is a border of that cluster; with < min_pts neighbors."""
    V = np.array([
        [0.0, 0.0], [0.4, 0.0], [0.0, 0.4],   # cores (ids 0-2)
        [0.95, 0.0],                           # border of 1 only (id 3)
        [5.0, 5.0],                            # noise (id 4)
    ])
    out = (
        dbscan_embeddings(_ds(V), eps2=0.49, min_pts=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # d2(3,1) = 0.3025 <= 0.49; d2(3,0) = 0.9025 > 0.49 -> 1 nbr + self
    assert list(out["role"]) == ["core", "core", "core", "border", "noise"]
    assert list(out["cluster"]) == [0, 0, 0, 0, -1]


def test_dbscan_partitioning_invariance(ray_session):
    V = _blobs()
    a = (dbscan_embeddings(_ds(V, parallelism=1), eps2=1.0, min_pts=3)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b = (dbscan_embeddings(_ds(V, parallelism=7), eps2=1.0, min_pts=3)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_dbscan_isolated_core_is_own_cluster(ray_session):
    """min_pts = 1 makes every point a core; points with no eps
    neighbor become singleton clusters labeled by their own id."""
    V = np.array([[0.0, 0.0], [100.0, 0.0], [0.3, 0.0]])
    out = (
        dbscan_embeddings(_ds(V), eps2=0.25, min_pts=1)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert list(out["role"]) == ["core", "core", "core"]
    assert list(out["cluster"]) == [0, 1, 0]  # 0-2 within eps? d2=0.09<=0.25


def test_dbscan_oracle_margin_holds():
    """The exact SQL oracle compares raw doubles against eps^2 = 1.3:
    engine (matmul expansion) and oracle (sequential sum) agree only
    because NO pairwise distance sits near the threshold. Pin a margin
    11 orders above the ~1e-14 FP discrepancy at both test scales."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(sf + "/embeddings.parquet", columns=["embedding"])
        V = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        d2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
        iu = np.triu_indices(len(V), 1)
        assert np.abs(d2[iu] - 1.3).min() > 1e-6


def test_euclidean_pairs_match_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    # round through float32 first: the Dataset stores float32, so the
    # brute-force reference must see identical values
    V = rng.normal(size=(60, 8)).astype(np.float32).astype(np.float64)
    eps2 = 4.0
    pairs = (
        euclidean_pairs_within(_ds(V, parallelism=5), eps2=eps2)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    d2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    ii, jj = np.triu_indices(len(V), 1)
    hit = d2[ii, jj] <= eps2
    exp = pd.DataFrame({"id_a": ii[hit], "id_b": jj[hit]}).astype(np.int64)
    pd.testing.assert_frame_equal(pairs, exp)
