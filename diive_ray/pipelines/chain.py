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


STEP_REGISTRY: dict[str, Callable] = {
    "setto_threshold": _step_setto_threshold,
    "setto_value": _step_setto_value,
    "flag_outliers": _step_flag_outliers,
    "qcf": _step_qcf,
    "rollup": _step_rollup,
    "gapfill": _step_gapfill,
    "features": _step_features,
    "map_batches": _step_map_batches,  # escape hatch: any fn(batch)->batch
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
