"""Composable pipeline chains — the engine's user-extension surface.

Mirrors the reference's two chaining APIs (SURVEY.md §2.10):
* ``StepwiseOutlierDetection`` — run any test, inspect, commit, chain
  (stepwiseoutlierdetection.py:28-462),
* ``run_chain(data, config)`` — one-call level cascade
  (diive/flux/fluxprocessingchain/run_chain.py:51-530).

Here a chain is data: an ordered list of ``Step`` specs; each step kind
maps to an engine stage through ``STEP_REGISTRY``. Users extend the
engine by registering ``fn(ds, **params) -> ds`` callables — the same
contract every built-in stage satisfies (any ``map_batches``-shaped
callable works).

    chain = Chain([
        Step("setto_threshold", col="value", threshold=280.0, type="max"),
        Step("flag_outliers", method="hampel", value_col="value",
             keys=("event_type",), window_length=49, repeat=False),
        Step("qcf", value_col="value"),
        Step("rollup", width_us=US_PER_HOUR, value_col="value_QCF_FILTERED",
             keys=("event_type",)),
    ])
    result = chain.run(ds)

Every step's output dataset is inspectable between steps (lazy until
consumed), matching the stepwise API's inspect-then-commit workflow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(frozen=True)
class Step:
    kind: str
    params: dict = field(default_factory=dict)

    def __init__(self, kind: str, **params):
        object.__setattr__(self, "kind", kind)
        object.__setattr__(self, "params", params)


def _step_setto_threshold(ds, *, col, threshold, type="max"):
    from ..stages.corrections import setto_threshold

    return setto_threshold(ds, col, threshold, type)


def _step_setto_value(ds, *, col, dates, value, ts_col="ts"):
    from ..stages.corrections import setto_value

    return setto_value(ds, col, dates, value, ts_col)


def _step_flag_outliers(ds, *, method, value_col, keys, **kw):
    from ..stages.outliers import flag_outliers

    return flag_outliers(ds, method, value_col=value_col, keys=keys, **kw)


def _step_qcf(ds, *, value_col=None, **kw):
    from ..stages.qcf import flag_qcf

    return flag_qcf(ds, value_col=value_col, **kw)


def _step_rollup(ds, *, width_us, value_col, keys, ts_col="ts", **kw):
    from ..stages.resample import rollup

    return rollup(ds, width_us, value_col=value_col, keys=keys, ts_col=ts_col, **kw)


def _step_gapfill(ds, *, width_us, keys, value_col="mean", **kw):
    from ..stages.gaps import gapfill_rollup

    return gapfill_rollup(ds, width_us, keys=keys, value_col=value_col, **kw)


def _step_features(ds, *, value_col, keys, **kw):
    from ..stages.features import engineer_features

    return engineer_features(ds, value_col=value_col, keys=keys, **kw)


def _step_map_batches(ds, *, fn, **kw):
    return ds.map_batches(fn, **kw)


def _step_daynight_flag(ds, *, ts_col="ts", lat=47.0, lon=8.5, out_col="is_day"):
    """L3.2 prerequisite: potential-radiation day/night flag
    (run_chain.py L3.2 separate_daytime_nighttime)."""
    import numpy as np

    from ..functions.solar import daytime_flag
    from ..util import ts_to_us

    def fn(df):
        df = df.copy()
        df[out_col] = daytime_flag(ts_to_us(df[ts_col]), lat, lon).astype(np.int64)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def _step_storage_correction(ds, *, flux_col="value", storage_col="storage", out_col="flux_corr", set_storage_to_zero=False):
    """L3.1 storage correction (run_chain.py:406-411): corrected flux =
    flux + storage term (or flux unchanged when storage is zeroed)."""
    def fn(df):
        df = df.copy()
        if set_storage_to_zero:
            df[out_col] = df[flux_col].astype(float)
        else:
            df[out_col] = df[flux_col].astype(float) + df[storage_col].astype(float)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def _step_qcf_combine(ds, *, flag_cols, out_col="FLAG_QCF"):
    """Combine test flags to the overall QCF flag: 2 (hard reject) if
    any listed flag is 2, else 0 (qcf.py flag algebra, hard flags)."""
    import numpy as np

    flag_cols = list(flag_cols)

    def fn(df):
        df = df.copy()
        bad = np.zeros(len(df), dtype=bool)
        for c in flag_cols:
            bad |= df[c].to_numpy() == 2
        df[out_col] = np.where(bad, 2, 0).astype(np.int64)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def _step_ustar_filter(ds, *, ustar_col="ustar", threshold=0.3, is_day_col="is_day", qcf_col="FLAG_QCF"):
    """L3.3 constant-USTAR scenario (run_chain.py:438-447): reject
    nighttime records with ustar below the threshold, and drop every
    QCF-rejected record — the accepted set feeds L4.1 / the rollup."""
    def fn(df):
        keep = ~((df[is_day_col].to_numpy() == 0) & (df[ustar_col].to_numpy() < threshold))
        if qcf_col in df.columns:
            keep &= df[qcf_col].to_numpy() != 2
        return df[keep]

    return ds.map_batches(fn, batch_format="pandas")


def _step_gapfill_score(ds, *, keys, value_col="mean", order_col="bucket_ts",
                        round6_first=True, **kw):
    """L4-style per-fill score report (run_chain.py fill levels report
    r2/MAE/RMSE per gap-filled variable; reference gapfilling/
    scores.py:41-49): deterministic hide-every-k planted scoring of the
    chain's rolled output (stages/scores.py:planted_gap_fill_scores).
    Terminal reporting step — output is the per-key score frame as a
    Dataset. ``round6_first`` rounds the value column before scoring so
    an SQL oracle replaying the chain can match bit-for-bit despite
    summation-order ULPs in the upstream rollup means."""
    import ray.data as rd

    from ..stages.scores import planted_gap_fill_scores
    from ..util import stable_round6

    if round6_first:
        def rnd(df):
            df = df.copy()
            df[value_col] = stable_round6(df[value_col].astype(float))
            return df

        ds = ds.map_batches(rnd, batch_format="pandas")
    return rd.from_pandas(
        planted_gap_fill_scores(ds, keys, value_col=value_col,
                                order_col=order_col, **kw)
    )


STEP_REGISTRY: dict[str, Callable] = {
    "setto_threshold": _step_setto_threshold,
    "setto_value": _step_setto_value,
    "flag_outliers": _step_flag_outliers,
    "qcf": _step_qcf,
    "rollup": _step_rollup,
    "gapfill": _step_gapfill,
    "features": _step_features,
    "map_batches": _step_map_batches,  # escape hatch: any fn(batch)->batch
    "daynight_flag": _step_daynight_flag,
    "storage_correction": _step_storage_correction,
    "qcf_combine": _step_qcf_combine,
    "ustar_filter": _step_ustar_filter,
    "gapfill_score": _step_gapfill_score,
}


def register_step(kind: str, fn: Callable) -> None:
    """User extension point: fn(ds, **params) -> ds."""
    STEP_REGISTRY[kind] = fn


@dataclass
class Chain:
    steps: list

    def run(self, ds: ray.data.Dataset, *, collect_intermediate: bool = False) -> Any:
        """Apply the steps in order; returns the final Dataset (and, if
        requested, every intermediate one for inspect-then-commit
        workflows)."""
        intermediates = []
        for step in self.steps:
            fn = STEP_REGISTRY.get(step.kind)
            if fn is None:
                raise KeyError(f"unknown step kind {step.kind!r}; register_step() first")
            ds = fn(ds, **step.params)
            if collect_intermediate:
                intermediates.append(ds)
        return (ds, intermediates) if collect_intermediate else ds
