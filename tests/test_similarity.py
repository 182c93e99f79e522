"""Similarity-search stages: brute-force top-k vs numpy oracle, LSH
recall on planted clusters, embedding near-dup pairs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import similarity as sim


@pytest.fixture(scope="module")
def vectors():
    """200 random unit-ish vectors + 5 planted near-dup pairs (cos>0.99)."""
    rng = np.random.Generator(np.random.Philox(key=77))
    X = rng.standard_normal((200, 32))
    for i in range(5):
        X[150 + i] = X[i] + rng.standard_normal(32) * 0.02  # near-copy of i
    ids = np.arange(200)
    return ids, X


@pytest.fixture(scope="module")
def ds(vectors, ray_session):
    ids, X = vectors
    df = pd.DataFrame({"vec_id": ids, "embedding": [row.astype(np.float32).tolist() for row in X]})
    return rd.from_pandas(df).repartition(4)


def _oracle_topk(X, ids, Q, qids, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Xn.T
    out = {}
    for qi, qid in enumerate(qids):
        order = sorted(range(len(ids)), key=lambda j: (-S[qi, j], ids[j]))
        out[qid] = [ids[j] for j in order if ids[j] != qid][:k]
    return out


def test_knn_brute_force_matches_oracle(ds, vectors):
    ids, X = vectors
    # use float32-rounded vectors as oracle input (the dataset stores f32)
    X32 = X.astype(np.float32).astype(np.float64)
    Q = X32[:4]
    got = sim.knn_brute_force(ds, Q, k=5, query_ids=ids[:4])
    exp = _oracle_topk(X32, ids, Q, ids[:4], 5)
    for qid in ids[:4]:
        g = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert g == exp[qid], f"query {qid}: {g} != {exp[qid]}"


def test_knn_lsh_finds_planted_near_dups(ds, vectors):
    ids, X = vectors
    X32 = X.astype(np.float32).astype(np.float64)
    Q = X32[:5]  # queries are the docs whose near-copies are planted at 150+i
    got = sim.knn_lsh(ds, Q, k=3, query_ids=ids[:5], n_planes=12, max_hamming=3)
    for i in range(5):
        g = got[got["query_id"] == i]
        # the planted near-copy must be found at rank 1 (cos > 0.99 -> same bucket whp)
        assert not g.empty and g.sort_values("rank")["vec_id"].iloc[0] == 150 + i


def test_embedding_near_dup_pairs_finds_planted(ds):
    got = sim.embedding_near_dup_pairs(ds, threshold=0.95, n_planes=8).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert {(i, 150 + i) for i in range(5)} <= pairs
    assert (got["cos_sim"] >= 0.95).all()
    # cross-round duplicates are dropped by the keyed exchange
    assert len(got) == len(got.drop_duplicates(subset=["id_a", "id_b"]))


def test_embedding_all_pairs_exact_matches_bruteforce(ds, vectors):
    """Sharded block-pairwise self-join == full-matrix oracle at the
    same threshold (every unordered pair scored exactly once)."""
    ids, X = vectors
    X32 = X.astype(np.float32).astype(np.float64)
    Xn = X32 / np.linalg.norm(X32, axis=1, keepdims=True)
    S = Xn @ Xn.T
    ii, jj = np.triu_indices(len(ids), 1)
    hit = S[ii, jj] >= 0.45
    exp = {(int(ids[a]), int(ids[b])): S[a, b] for a, b in zip(ii[hit], jj[hit])}

    got = sim.embedding_all_pairs_exact(ds, threshold=0.45, n_shards=5).to_pandas()
    got_pairs = {(int(r.id_a), int(r.id_b)): r.cos_sim for r in got.itertuples()}
    assert set(got_pairs) == set(exp)
    for p, v in exp.items():
        assert abs(got_pairs[p] - v) < 1e-9
    # no duplicate pairs across shard blocks
    assert len(got) == len(got.drop_duplicates(subset=["id_a", "id_b"]))


def test_knn_ivf_finds_planted_near_dups(ds, vectors):
    """IVF probe path: the planted near-copies (cos > 0.99) land in the
    same coarse cell as their source, so rank-1 recall holds even with
    few probes."""
    ids, X = vectors
    X32 = X.astype(np.float32).astype(np.float64)
    Q = X32[:5]
    got = sim.knn_ivf(ds, Q, k=3, query_ids=ids[:5], n_centroids=8, n_probe=3)
    found = 0
    for i in range(5):
        g = got[got["query_id"] == i].sort_values("rank")
        if len(g) and g["vec_id"].iloc[0] == 150 + i:
            found += 1
    assert found >= 4  # allow one cell-boundary miss

def test_knn_ivf_full_probe_is_exact(ds, vectors):
    ids, X = vectors
    X32 = X.astype(np.float32).astype(np.float64)
    Q = X32[:3]
    exact = sim.knn_brute_force(ds, Q, k=5, query_ids=ids[:3])
    full = sim.knn_ivf(ds, Q, k=5, query_ids=ids[:3], n_centroids=4, n_probe=4)
    for qid in ids[:3]:
        a = exact[exact["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        b = full[full["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert a == b, qid


def test_knn_pq_lossless_codebook_is_exact(ray_session):
    """Vectors drawn from a tiny per-subspace codebook: quantization
    error is zero, so pure-ADC sims equal exact cosine and the ranking
    matches brute force."""
    rng = np.random.Generator(np.random.Philox(key=101))
    m, dsub, ks = 4, 8, 6
    books = rng.standard_normal((m, ks, dsub))
    # unit-norm codebook entries -> every composed row has norm sqrt(m),
    # so cosine normalization is a UNIFORM scale and the normalized
    # subvectors still come from a 6-entry codebook (true losslessness)
    books /= np.linalg.norm(books, axis=2, keepdims=True)
    picks = rng.integers(0, ks, size=(120, m))
    X = np.concatenate([books[j][picks[:, j]] for j in range(m)], axis=1)
    ids = np.arange(120)
    df = pd.DataFrame({"vec_id": ids, "embedding": [r.tolist() for r in X]})
    ds2 = rd.from_pandas(df).repartition(3)
    Q = X[:3]
    exact = sim.knn_brute_force(ds2, Q, k=5, query_ids=ids[:3])
    # ks=32 >= 6 distinct subvectors per subspace -> lossless
    pq = sim.knn_pq(ds2, Q, k=5, query_ids=ids[:3], m=m, ks=32, train_sample=120)
    for qid in ids[:3]:
        a = exact[exact["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        b = pq[pq["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert a == b, qid


def test_knn_pq_rerank_finds_planted_near_dups(ds, vectors):
    ids, X = vectors
    X32 = X.astype(np.float32).astype(np.float64)
    Q = X32[:5]
    got = sim.knn_pq(
        ds, Q, k=3, query_ids=ids[:5], m=4, ks=16, rerank_factor=6,
        train_sample=200,
    )
    found = 0
    for i in range(5):
        g = got[got["query_id"] == i].sort_values("rank")
        if len(g) and g["vec_id"].iloc[0] == 150 + i:
            found += 1
    assert found >= 4  # ADC screen + exact rerank: at most one miss


def test_pq_encode_decode_algebra():
    """pq_encode picks the L2-nearest centroid per subspace; ADC table
    gather equals the dot product against the reconstruction."""
    rng = np.random.Generator(np.random.Philox(key=55))
    X = rng.standard_normal((50, 16))
    books = sim.pq_fit(X, m=4, ks=8, seed=3)
    codes = sim.pq_encode(X, books)
    assert codes.shape == (50, 4) and codes.dtype == np.uint8
    q = rng.standard_normal(16)
    qn = q / np.linalg.norm(q)
    T = np.stack([qn[j * 4 : (j + 1) * 4] @ books[j].T for j in range(4)], axis=0)
    adc = sum(T[j, codes[:, j]] for j in range(4))
    recon = np.concatenate([books[j][codes[:, j]] for j in range(4)], axis=1)
    np.testing.assert_allclose(adc, recon @ qn, rtol=1e-12)
