"""Unit pins for the round-2 late adds: repetition filters, PII
detect/redact, and distributed Lloyd's k-means (stages/cluster.py).
Oracle parity at sf0.001 is covered by test_queries_vs_duckdb."""

import numpy as np
import pyarrow as pa
import pytest

from diive_ray.functions import text as tx


# ------------------------------------------------------------- repetition


def _ref_repetition(text: str):
    ws = text.split(" ") if text else []
    n = len(ws)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    from collections import Counter

    c1 = Counter(ws)
    top_word = max(c1.values()) / n
    top2 = 0.0
    if n >= 2:
        c2 = Counter(zip(ws[:-1], ws[1:]))
        top2 = max(c2.values()) / (n - 1)
    dup3 = 0.0
    if n >= 3:
        g3 = list(zip(ws[:-2], ws[1:-1], ws[2:]))
        c3 = Counter(g3)
        dup3 = sum(1 for g in g3 if c3[g] >= 2) / (n - 2)
    return n, top_word, top2, dup3


def test_repetition_features_match_reference():
    texts = [
        "a b c a b c a b c",          # heavy 2/3-gram repetition
        "x y z w v u",                # no repetition
        "a a a a a",                  # one word
        "a b",                        # too short for 3-grams
        "q",                          # single word
        "",                           # empty
        "p q p q r p q p q r s",      # partial dup 3-grams
    ]
    feat = tx.repetition_features(texts)
    for i, t in enumerate(texts):
        n, tw, t2, d3 = _ref_repetition(t)
        assert feat["n_words_sp"][i] == n, t
        assert feat["top_word_frac"][i] == pytest.approx(tw), t
        assert feat["top2gram_frac"][i] == pytest.approx(t2), t
        assert feat["dup3gram_frac"][i] == pytest.approx(d3), t


def test_repetition_batch_equals_per_doc():
    texts = ["a b c a b", "c d e", "a a a"]
    batch = tx.repetition_features(texts)
    for i, t in enumerate(texts):
        solo = tx.repetition_features([t])
        for k in batch:
            assert batch[k][i] == solo[k][0]


# -------------------------------------------------------------------- PII


def test_pii_counts_and_redact():
    texts = pa.array(
        [
            "reach me at jo.doe+x@mail-host.org today",
            "call 555-012-3456 or 555-999-0000",
            "server at 10.0.3.9 and 192.168.1.1",
            "clean text with no pii at all",
            "mixed a@b.co 555-111-2222 1.2.3.4",
        ]
    )
    c = tx.pii_counts(texts)
    assert c["n_email"].to_pylist() == [1, 0, 0, 0, 1]
    assert c["n_phone"].to_pylist() == [0, 2, 0, 0, 1]
    assert c["n_ipv4"].to_pylist() == [0, 0, 2, 0, 1]
    red = tx.pii_redact(texts).to_pylist()
    assert red[0] == "reach me at <PII> today"
    assert red[1] == "call <PII> or <PII>"
    assert red[2] == "server at <PII> and <PII>"
    assert red[3] == "clean text with no pii at all"
    assert red[4] == "mixed <PII> <PII> <PII>"


def test_pii_phone_not_matched_inside_longer_number():
    # \b guards: a 3-3-4 shape embedded in a longer digit run must not match
    texts = pa.array(["x 1555-012-34567 y", "x 555-012-3456 y"])
    c = tx.pii_counts(texts)
    assert c["n_phone"].to_pylist() == [0, 1]


# ---------------------------------------------------------------- k-means


def test_kmeans_lloyd_recovers_planted_blobs(ray_session):
    import ray.data as rd

    from diive_ray.stages.cluster import kmeans_lloyd

    rng = np.random.Generator(np.random.Philox(key=11))
    centers = np.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]])
    labels = rng.integers(0, 3, size=120)
    X = centers[labels] + rng.normal(0, 0.2, size=(120, 3))
    # ids ordered so the 3 smallest ids land in 3 DIFFERENT blobs
    order = np.concatenate([np.flatnonzero(labels == j)[:1] for j in range(3)])
    rest = np.setdiff1d(np.arange(120), order)
    perm = np.concatenate([order, rest])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(120, dtype=np.int64)),
                "embedding": pa.array([X[p].tolist() for p in perm], pa.list_(pa.float32())),
            }
        )
    )
    C, out = kmeans_lloyd(ds, 3, n_iter=4)
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    planted = labels[perm]
    # cluster j was seeded from blob j, so assignment == planted label
    assert (df["cluster"].to_numpy() == planted).all()
    assert C.shape == (3, 3)
    # centroids close to the true centers
    assert np.abs(C - centers).max() < 0.15


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    import ray.data as rd

    from diive_ray.stages.cluster import kmeans_init_min_ids, kmeans_lloyd

    # seeds 0,1 in blobs A and B; seed 2 duplicates seed 1's vector and
    # blob B sits EXACTLY on it, so every B point ties between clusters
    # 1 and 2 and the tie-break (lowest cid) starves cluster 2 on every
    # iteration. Without the keep-previous rule its centroid would turn
    # into 0/0 = NaN and poison all later assignments.
    emb = [[0.0, 0.0], [10.0, 10.0], [10.0, 10.0]] + [[0.1, 0.1]] * 5 + [[10.0, 10.0]] * 5
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(13, dtype=np.int64)),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
            }
        )
    )
    C0 = kmeans_init_min_ids(ds, 3)
    C, out = kmeans_lloyd(ds, 3, n_iter=2)
    # cluster 2 never wins a point (tie -> cid 1), centroid unchanged
    assert (C[2] == C0[2]).all()
    assert set(out.to_pandas()["cluster"].unique()) <= {0, 1}


# ------------------------------------------------------------- chunking


def test_doc_chunk_window_edges(ray_session):
    import pandas as pd
    import ray.data as rd

    from diive_ray.pipelines.docqueries import q_doc_chunk

    # monkey-shape: drive the same batch fn through a tiny in-memory
    # table by writing it to parquet under /tmp and pointing the query
    # at the directory layout it expects
    import os, tempfile

    d = tempfile.mkdtemp(prefix="chunk_test_")
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "text": [
                " ".join(f"w{i}" for i in range(32)),   # exactly one window
                " ".join(f"w{i}" for i in range(33)),   # 2 windows: 32 + ragged 9
                " ".join(f"w{i}" for i in range(24)),   # single ragged window
                "solo",                                  # 1-word window
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pd.array([0, 0, 0, 0], dtype="int64"),
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    out = q_doc_chunk(d).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = out.groupby("doc_id")["n_words_chunk"].apply(list).to_dict()
    assert got == {1: [32, 8], 2: [32, 9], 3: [24], 4: [1]}
    # stride-24 overlap: doc 1 second chunk covers words 24..31
    r = out[(out.doc_id == 1) & (out.chunk_id == 1)].iloc[0]
    assert r["chunk_text"] == " ".join(f"w{i}" for i in range(24, 32))
