"""Trained quality classifier (stages/classifier.py): separation on a
planted two-population corpus, bit-stable weights across
partitionings, IRLS sanity vs a closed-form check."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _corpus(n_each=300, seed=5):
    rng = np.random.default_rng(seed)
    words = ["the", "of", "and", "to", "in", "house", "river", "light",
             "garden", "story", "music", "window", "evening", "quiet"]
    clean = [
        " ".join(rng.choice(words, rng.integers(20, 60))).capitalize() + "."
        for _ in range(n_each)
    ]
    junk_bits = ["$$$", "1234567890", "!!!", "@@@###", "0x1f", "%%%%%", "///",
                 "???!!!", "9999999", "#####"]
    junk = [" ".join(rng.choice(junk_bits, rng.integers(5, 30))) for _ in range(n_each)]
    return pd.DataFrame({
        "doc_id": np.arange(2 * n_each, dtype=np.int64),
        "text": clean + junk,
        "label": [1] * n_each + [0] * n_each,
    })


def test_classifier_separates_and_is_partitioning_invariant(ray_session):
    from diive_ray.stages.classifier import score_quality, train_quality_classifier

    df = _corpus()
    weights = []
    for parts in (1, 4, 9):
        w = train_quality_classifier(
            rd.from_pandas(df).repartition(parts), label_col="label")
        weights.append(w)
    # bit-stable across partitionings (sample sorted by id before fit)
    assert np.array_equal(weights[0], weights[1])
    assert np.array_equal(weights[1], weights[2])

    scored = score_quality(
        rd.from_pandas(df).repartition(4), weights[0],
        keep_cols=("doc_id",),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    p = scored["qc_prob"].to_numpy()
    y = df["label"].to_numpy()
    assert p[y == 1].mean() > 0.9 and p[y == 0].mean() < 0.1
    # hard ranking check: worst clean doc above best junk doc (AUC == 1
    # is too strict for weak features; demand near-perfect separation)
    auc = (p[y == 1][:, None] > p[y == 0][None, :]).mean()
    assert auc > 0.98


def test_irls_matches_brute_force_gradient_descent():
    """IRLS lands on the same optimum a long plain-GD run approaches."""
    from diive_ray.stages.classifier import fit_logistic_irls

    rng = np.random.default_rng(0)
    X = np.column_stack([np.ones(400), rng.normal(size=(400, 2))])
    true_w = np.array([0.3, 1.5, -2.0])
    y = (rng.random(400) < 1 / (1 + np.exp(-X @ true_w))).astype(float)

    w = fit_logistic_irls(X, y, ridge=1e-6)
    wg = np.zeros(3)
    for _ in range(200_000):
        p = 1 / (1 + np.exp(-X @ wg))
        wg += 0.01 * (X.T @ (y - p) - 1e-6 * wg) / len(y)
    assert np.allclose(w, wg, atol=1e-3)


def test_hash_sampling_bounds_training_set(ray_session):
    from diive_ray.stages.classifier import train_quality_classifier

    df = _corpus(n_each=500, seed=9)
    w_full = train_quality_classifier(
        rd.from_pandas(df).repartition(3), label_col="label", sample_pct=100)
    w_half = train_quality_classifier(
        rd.from_pandas(df).repartition(3), label_col="label", sample_pct=50)
    # a genuine subsample: different fit, same sign structure on the
    # discriminative features, and still separating
    assert not np.array_equal(w_full, w_half)
    assert np.sign(w_full[-1]) == np.sign(w_half[-1])  # stopword_ratio


def test_registry_query_separates_planted_split(ray_session):
    """The doc_quality_classifier query's planted degradation is
    recovered: near-perfect probability separation at sf0.001."""
    from diive_ray.pipelines.docqueries import q_doc_quality_classifier

    out = q_doc_quality_classifier("/root/testdata/sf0.001")
    p1 = out.loc[out.is_clean == 1, "qc_prob"].to_numpy()
    p0 = out.loc[out.is_clean == 0, "qc_prob"].to_numpy()
    assert p1.mean() > 0.9 and p0.mean() < 0.1
    auc = (p1[:, None] > p0[None, :]).mean()
    assert auc > 0.99
