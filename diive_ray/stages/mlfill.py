"""Model-based gap-filling — the RandomForestTS/XGBoostTS translation
(diive/gapfilling/randomforest_ts.py:163, xgboost_ts.py, longterm.py).

The reference trains a sklearn/xgboost regressor on timestamp +
engineered features and predicts the gaps. Neither library ships in
this container, so the regressor is a closed-form **ridge regression**
(numpy normal equations) behind the same stage contract — swap
``fit_ridge``/``RidgePredictor`` for any model object without touching
the Ray wiring:

* ``train_per_key`` — per-key fit inside a grouped block stage (the
  reference's per-year model of longterm.py:42-50 maps to per-key
  here); coefficient table is tiny and collected to the driver.
* ``ridge_fill`` — the trained coefficients are ``ray.put`` once and
  read back in each predict actor's ``__init__`` (the model-in-actor
  pattern for stateful stages); prediction is one matmul per batch.

Features: diurnal + annual harmonics of the bucket timestamp
(sin/cos of hour-of-day and day-of-year) + intercept — the timestamp
feature family of FeatureEngineer (feature_engineer.py, timestamp
stage) that stays computable at gap rows.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray
import ray.data

from ..util import ts_to_us

FEATURE_NAMES = ("sin_h", "cos_h", "sin_doy", "cos_doy")


def time_features(ts_us: np.ndarray) -> np.ndarray:
    """[n, 4] harmonic features from END-labeled bucket stamps."""
    sec_of_day = (ts_us // 1_000_000) % 86_400
    day_of_year = (ts_us // 1_000_000 // 86_400) % 365.25
    h = 2 * np.pi * sec_of_day / 86_400.0
    d = 2 * np.pi * day_of_year / 365.25
    return np.column_stack([np.sin(h), np.cos(h), np.sin(d), np.cos(d)])


def fit_ridge(X: np.ndarray, y: np.ndarray, l2: float = 1e-6) -> np.ndarray:
    """Closed-form ridge with intercept: returns [d+1] coef (last =
    intercept). Deterministic (no iterative solver)."""
    Xi = np.column_stack([X, np.ones(len(X))])
    A = Xi.T @ Xi + l2 * np.eye(Xi.shape[1])
    b = Xi.T @ y
    return np.linalg.solve(A, b)


def train_per_key(
    ds: ray.data.Dataset,
    *,
    value_col: str = "mean",
    keys: Iterable[str] = ("source",),
    bucket_col: str = "bucket_ts",
    l2: float = 1e-6,
) -> pd.DataFrame:
    """Fit one ridge model per key on its observed tier rows. Returns
    the (tiny) coefficient table: keys + c0..c3 + intercept + n_train."""
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        obs = df[df[value_col].notna()]
        row = {k: df[k].iloc[0] for k in keys}
        if len(obs) < 8:
            for i, _ in enumerate(FEATURE_NAMES):
                row[f"c{i}"] = 0.0
            row["intercept"] = float(obs[value_col].mean()) if len(obs) else 0.0
            row["n_train"] = len(obs)
            return pd.DataFrame([row])
        X = time_features(ts_to_us(obs[bucket_col]))
        coef = fit_ridge(X, obs[value_col].astype(float).to_numpy(), l2)
        for i, _ in enumerate(FEATURE_NAMES):
            row[f"c{i}"] = coef[i]
        row["intercept"] = coef[-1]
        row["n_train"] = len(obs)
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn).to_pandas()


class RidgePredictor:
    """Actor-pool predict stage: coefficients fetched once per actor."""

    def __init__(self, coef_ref, keys, value_col, bucket_col, out_col):
        table = ray.get(coef_ref)
        self.keys = keys
        self.value_col = value_col
        self.bucket_col = bucket_col
        self.out_col = out_col
        self.models = {}
        for _, r in table.iterrows():
            k = r[keys[0]] if len(keys) == 1 else tuple(r[kk] for kk in keys)
            self.models[k] = (
                np.array([r[f"c{i}"] for i in range(len(FEATURE_NAMES))]),
                float(r["intercept"]),
            )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        us = ts_to_us(df[self.bucket_col])
        X = time_features(us)
        pred = np.full(len(df), np.nan)
        # vectorized per model: one matmul per key's row group (no
        # per-row Python)
        kframe = df[self.keys].reset_index(drop=True)
        for k, rows in kframe.groupby(self.keys, sort=False).groups.items():
            m = self.models.get(k)
            if m is not None:
                rows = np.asarray(rows)
                pred[rows] = X[rows] @ m[0] + m[1]
        v = df[self.value_col].astype(float)
        df[self.out_col] = v.where(v.notna(), pred)
        df[f"{self.out_col}_is_model"] = (v.isna() & ~np.isnan(pred)).astype(np.int8)
        return df


def train_test_split(
    ds: ray.data.Dataset,
    *,
    test_size: float = 0.25,
    id_col: str = "doc_id",
    seed: int = 42,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Deterministic seeded hash split (the reference's per-model
    test_size=0.25 split, longterm.py:37 / ml/common.py): each row goes
    to test iff a salted CRC of its id lands below test_size. Stable
    across runs, cluster sizes, and partitionings (row-content-keyed,
    not position-keyed), no shuffle — two filtered passes over the
    same lazy dataset."""
    import zlib

    import pyarrow as pa

    bound = int(test_size * (1 << 32))

    def hash_bucket(t: pa.Table, want_test: bool) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = np.array(
            [zlib.crc32(f"{seed}|{v}".encode()) for v in ids], dtype=np.uint64
        )
        is_test = h < bound
        return t.filter(pa.array(is_test if want_test else ~is_test))

    train = ds.map_batches(lambda t: hash_bucket(t, False), batch_format="pyarrow", zero_copy_batch=True)
    test = ds.map_batches(lambda t: hash_bucket(t, True), batch_format="pyarrow", zero_copy_batch=True)
    return train, test


TREE_FEATURES = ("sec_of_day", "day_of_year", "sin_h", "cos_h", "sin_doy", "cos_doy")


def tree_time_features(ts_us: np.ndarray) -> np.ndarray:
    """[n, 6] feature matrix for tree models: raw second-of-day and
    day-of-year (trees split on raw cyclic position directly, no
    harmonic basis needed) plus the ridge harmonics for smoothness."""
    sec_of_day = ((ts_us // 1_000_000) % 86_400).astype(np.float64)
    day_of_year = ((ts_us // 1_000_000 // 86_400) % 365.25).astype(np.float64)
    h = 2 * np.pi * sec_of_day / 86_400.0
    d = 2 * np.pi * day_of_year / 365.25
    return np.column_stack([sec_of_day, day_of_year, np.sin(h), np.cos(h), np.sin(d), np.cos(d)])


def reduce_features_local(
    X: np.ndarray,
    y: np.ndarray,
    *,
    seed: int = 42,
    k_factor: float = 0.5,
    n_repeats: int = 5,
    model: str = "forest",
    **model_kw,
) -> tuple[np.ndarray, np.ndarray]:
    """SHAP-style feature reduction against a random benchmark
    (reference core/ml/common.py:779 ``reduce_features``): append a
    random variable, fit, measure each feature's importance, and keep
    only features whose importance exceeds
    ``random_importance + k_factor * random_sd`` (and > 0).

    Re-derivation: the reference's mean-|SHAP| importance (shap absent
    from this container) becomes permutation importance — the MSE
    increase when a feature column is permuted, averaged over
    ``n_repeats`` draws; the benchmark SD is the repeat-to-repeat SD of
    the random feature's importance. Returns (accepted_mask,
    importance_means); if every feature falls below the benchmark the
    single best one is kept (a featureless model is useless)."""
    from . import trees as tr

    n, nf = X.shape
    rng = np.random.Generator(np.random.Philox(key=seed ^ 0x5EED))
    Xa = np.hstack([X, rng.random(n)[:, None]])
    if model == "gbm":
        m = tr.fit_gbm(Xa, y, seed=seed, **model_kw)
        predict = tr.predict_gbm
    else:
        m = tr.fit_forest(Xa, y, seed=seed, **model_kw)
        predict = tr.predict_forest
    base_mse = float(np.mean((predict(m, Xa) - y) ** 2))
    imps = np.zeros((nf + 1, n_repeats))
    for j in range(nf + 1):
        for r in range(n_repeats):
            Z = Xa.copy()
            Z[:, j] = Z[rng.permutation(n), j]
            imps[j, r] = float(np.mean((predict(m, Z) - y) ** 2)) - base_mse
    imp_mean = imps.mean(axis=1)
    threshold = imp_mean[-1] + k_factor * imps[-1].std()
    accepted = (imp_mean[:-1] > threshold) & (imp_mean[:-1] > 0)
    if not accepted.any():
        accepted[np.argmax(imp_mean[:-1])] = True
    return accepted, imp_mean[:-1]


def train_trees_per_key(
    ds: ray.data.Dataset,
    *,
    value_col: str = "mean",
    keys: Iterable[str] = ("source",),
    bucket_col: str = "bucket_ts",
    model: str = "forest",
    seed: int = 42,
    feature_fn=None,
    reduce_features: bool = False,
    k_factor: float = 0.5,
    **model_kw,
) -> pd.DataFrame:
    """Fit one tree-ensemble per key (the reference's per-year model of
    longterm.py:42-50 maps to per-key here; model classes re-derived in
    stages/trees.py). The fitted flat-array trees are pickled into a
    bytes column — a few KB per key — and collected to the driver for
    broadcast.

    ``feature_fn(ts_us) -> (n, k) array`` optionally appends physics
    features derived from the timestamp (e.g. potential radiation for
    the SW_IN filler, swin.py:23's SW_IN_POT-as-dominant-predictor
    design) to the standard time features."""
    import pickle
    import zlib

    from . import trees as tr

    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        obs = df[df[value_col].notna()]
        row = {k: df[k].iloc[0] for k in keys}
        key_seed = seed ^ zlib.crc32("|".join(str(row[k]) for k in keys).encode())
        if len(obs) < 16:
            blob = pickle.dumps(("const", float(obs[value_col].mean()) if len(obs) else 0.0))
        else:
            us = ts_to_us(obs[bucket_col])
            X = tree_time_features(us)
            if feature_fn is not None:
                X = np.hstack([X, np.atleast_2d(feature_fn(us).T).T.reshape(len(obs), -1)])
            y = obs[value_col].astype(float).to_numpy()
            mask = None
            if reduce_features:
                mask, _ = reduce_features_local(
                    X, y, seed=key_seed, k_factor=k_factor, model=model, **model_kw
                )
                X = X[:, mask]
            if model == "gbm":
                m = tr.fit_gbm(X, y, seed=key_seed, **model_kw)
                blob = pickle.dumps(("gbm", m, mask))
            else:
                m = tr.fit_forest(X, y, seed=key_seed, **model_kw)
                blob = pickle.dumps(("forest", m, mask))
        row["model"] = blob
        row["n_train"] = len(obs)
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn).to_pandas()


class TreePredictor:
    """Actor-pool predict stage: models unpickled once per actor in
    __init__, prediction is a vectorized tree descent per key group."""

    def __init__(self, model_ref, keys, value_col, bucket_col, out_col,
                 feature_fn=None):
        import pickle

        table = ray.get(model_ref)
        self.feature_fn = feature_fn
        self.keys = keys
        self.value_col = value_col
        self.bucket_col = bucket_col
        self.out_col = out_col
        self.models = {}
        for _, r in table.iterrows():
            k = r[keys[0]] if len(keys) == 1 else tuple(r[kk] for kk in keys)
            self.models[k] = pickle.loads(r["model"])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from . import trees as tr

        df = df.copy()
        us = ts_to_us(df[self.bucket_col])
        X = tree_time_features(us)
        if self.feature_fn is not None:
            X = np.hstack([X, np.atleast_2d(self.feature_fn(us).T).T.reshape(len(df), -1)])
        pred = np.full(len(df), np.nan)
        kframe = df[self.keys].reset_index(drop=True)
        for k, rows in kframe.groupby(self.keys, sort=False).groups.items():
            m = self.models.get(k)
            if m is None:
                continue
            rows = np.asarray(rows)
            kind, payload, *rest = m
            mask = rest[0] if rest else None
            Xr = X[rows] if mask is None else X[rows][:, mask]
            if kind == "const":
                pred[rows] = payload
            elif kind == "gbm":
                pred[rows] = tr.predict_gbm(payload, Xr)
            else:
                pred[rows] = tr.predict_forest(payload, Xr)
        v = df[self.value_col].astype(float)
        df[self.out_col] = v.where(v.notna(), pred)
        df[f"{self.out_col}_is_model"] = (v.isna() & ~np.isnan(pred)).astype(np.int8)
        return df


def tree_fill(
    ds: ray.data.Dataset,
    *,
    value_col: str = "mean",
    keys: Iterable[str] = ("source",),
    bucket_col: str = "bucket_ts",
    out_col: str | None = None,
    model: str = "forest",
    seed: int = 42,
    concurrency=(1, 8),
    feature_fn=None,
    reduce_features: bool = False,
    **model_kw,
) -> ray.data.Dataset:
    """RandomForestTS/XGBoostTS-shaped gap-fill on the from-scratch
    ensembles (randomforest_ts.py:163 contract: observed values never
    modified; prediction only at gaps). ``feature_fn`` appends
    timestamp-derived physics features at train AND predict time (must
    be a picklable module-level callable). ``reduce_features`` enables
    the per-key SHAP-style pruning pass (run_chain.py:119-131: on by
    default in the reference chain; opt-in here)."""
    keys = list(keys)
    out_col = out_col or f"{value_col}_treefilled"
    models = train_trees_per_key(
        ds, value_col=value_col, keys=keys, bucket_col=bucket_col,
        model=model, seed=seed, feature_fn=feature_fn,
        reduce_features=reduce_features, **model_kw,
    )
    model_ref = ray.put(models)
    return ds.map_batches(
        TreePredictor,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_args=(model_ref, keys, value_col, bucket_col, out_col,
                             feature_fn),
    )


def ridge_fill(
    ds: ray.data.Dataset,
    *,
    value_col: str = "mean",
    keys: Iterable[str] = ("source",),
    bucket_col: str = "bucket_ts",
    out_col: str | None = None,
    l2: float = 1e-6,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Train per key -> broadcast coefficients -> actor-pool predict.
    Observed values are never modified (gap-fill contract,
    tests/test_gapfilling.py:186-214 in the reference)."""
    keys = list(keys)
    out_col = out_col or f"{value_col}_mlfilled"
    coefs = train_per_key(ds, value_col=value_col, keys=keys, bucket_col=bucket_col, l2=l2)
    coef_ref = ray.put(coefs)
    return ds.map_batches(
        RidgePredictor,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_args=(coef_ref, keys, value_col, bucket_col, out_col),
    )


def tree_fill_scores(
    ds: ray.data.Dataset,
    *,
    value_col: str = "mean",
    keys: Iterable[str] = ("source",),
    bucket_col: str = "bucket_ts",
    model: str = "forest",
    seed: int = 42,
    test_size: float = 0.25,
    feature_fn=None,
    reduce_features: bool = False,
    concurrency=(1, 8),
    **model_kw,
) -> pd.DataFrame:
    """Held-out gap-fill scores — the reference's ``scores_traintest_``
    (core/ml/common.py:259, metrics from gapfilling/scores.py:41-49):
    deterministic hash split, per-key model fit on the train rows,
    prediction of the test rows' *observed* values (hidden from the
    predictor), then the seven regression metrics per key. One keyed
    exchange for training, one actor-pool predict pass, one keyed
    exchange for the (medae/maxe-exact) scoring."""
    from .scores import scores_per_key

    import pyarrow.compute as pc

    keys = list(keys)
    obs = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[value_col])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # bucket_ts is per-key-unique in tier frames -> a content-stable id
    split_ds = obs.map_batches(
        lambda t: t.append_column(
            "__split_id",
            __import__("pyarrow").compute.binary_join_element_wise(
                *[t[k].cast("string") for k in keys],
                t[bucket_col].cast("int64").cast("string"),
                "|",
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    train, test = train_test_split(
        split_ds, test_size=test_size, id_col="__split_id", seed=seed
    )
    models = train_trees_per_key(
        train, value_col=value_col, keys=keys, bucket_col=bucket_col,
        model=model, seed=seed, feature_fn=feature_fn,
        reduce_features=reduce_features, **model_kw,
    )
    model_ref = ray.put(models)

    def hide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__truth"] = df[value_col]
        df[value_col] = np.nan
        return df

    pred = test.map_batches(hide, batch_format="pandas").map_batches(
        TreePredictor,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_args=(model_ref, keys, value_col, bucket_col, "__pred",
                             feature_fn),
    )
    return scores_per_key(pred, keys, pred_col="__pred", target_col="__truth")
