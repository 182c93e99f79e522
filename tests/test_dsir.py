"""DSIR importance weights (stages/dsir.py): planted target-vocabulary
shift is recovered, selection prefers target-like docs, partitioning
invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.dsir import collect_vocab, dsir_weights, fit_dsir, select_top_k


def _corpus():
    """doc_id % 101 == 0 docs (the target set) speak vocabulary A;
    half the raw docs speak A ('target-like'), half speak B."""
    rng = np.random.default_rng(13)
    vocab_a = np.array([f"a{i}" for i in range(30)])
    vocab_b = np.array([f"b{i}" for i in range(30)])
    rows = []
    for doc_id in range(0, 400):
        if doc_id % 101 == 0:
            words = rng.choice(vocab_a, size=40)
        elif doc_id % 2 == 0:
            words = rng.choice(vocab_a, size=40)  # target-like raw doc
        else:
            words = rng.choice(vocab_b, size=40)
        rows.append({"doc_id": doc_id, "text": " ".join(words)})
    return pd.DataFrame(rows)


def test_dsir_recovers_planted_shift(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df)
    vocab = collect_vocab(ds)
    lr = fit_dsir(ds, vocab, target_mod=101, n_buckets=64)
    scores = dsir_weights(ds, vocab, lr, target_mod=101).to_pandas()
    raw = scores[scores["is_target"] == 0]
    a_like = raw[raw["doc_id"] % 2 == 0]["logw"]
    b_like = raw[raw["doc_id"] % 2 == 1]["logw"]
    # every vocabulary-A doc outweighs every vocabulary-B doc
    assert a_like.min() > b_like.max()


def test_dsir_select_top_k_exact_and_invariant(ray_session):
    df = _corpus()
    vocab = collect_vocab(rd.from_pandas(df))
    lr = fit_dsir(rd.from_pandas(df), vocab, target_mod=101, n_buckets=64)

    def run(nparts):
        ds = rd.from_pandas(df).repartition(nparts)
        scores = dsir_weights(ds, vocab, lr, target_mod=101)
        out = select_top_k(scores, 25).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a, b)
    sel = a[a["selected"] == 1]
    assert len(sel) == 25
    assert (sel["is_target"] == 0).all()
    # selected docs are exactly the 25 highest-logw non-target docs
    raw = a[a["is_target"] == 0].sort_values(["logw", "doc_id"], ascending=[False, True])
    assert set(sel["doc_id"]) == set(raw.head(25)["doc_id"])
    # and all of them are target-like (vocabulary A)
    assert (sel["doc_id"] % 2 == 0).all()
