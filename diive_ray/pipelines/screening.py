"""StepwiseMeteoScreening-style pipeline: corrections -> outlier tests
-> QCF -> tier resample — the reference's §3.1 lifecycle
(diive/preprocessing/qaqc/meteoscreening.py:37-658) as ONE lazy Ray
Data plan.

Reference control flow (meteoscreening.py): per-variable series ->
TimestampSanitizer -> correction list -> each outlier test runs
repeat-until-convergence then ``addflag()`` masks hard-rejects to null
-> FlagQCF combines -> ``resample_series_to_30MIN``. Here the chain is
declarative: a ``ScreeningSpec`` lists corrections and tests; stages
compose as map_batches / grouped-block stages; the final tier rollup
reuses the fused cascade machinery. Tests are run on the *progressively
cleaned* series exactly like the stepwise API
(stepwiseoutlierdetection.py:416-424: each addflag nulls flag==2
before the next test sees the data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import ray.data

from ..stages import outliers as ol
from ..stages.corrections import setto_threshold
from ..stages.exchange import grouped_block_map
from ..stages.qcf import qcf_frame
from ..stages.resample import mincounts_30min_rule
from ..stages.bucket import bucket_end_us
from ..util import ts_to_us


@dataclass
class ScreeningSpec:
    """Declarative stepwise chain (the reference's stepwise API surface,
    stepwiseoutlierdetection.py:28-462, as data)."""

    value_col: str
    keys: tuple = ("source",)
    ts_col: str = "ts"
    cap_max: float | None = None          # setto_threshold type='max'
    cap_min: float | None = None          # setto_threshold type='min'
    tests: list = field(default_factory=list)  # [(kernel_name, kwargs), ...]
    resample_width_us: int | None = None
    mincounts_perc: float = 0.0
    raw_width_us: int | None = None
    end_stamped: bool = True


def screen(ds: ray.data.Dataset, spec: ScreeningSpec) -> ray.data.Dataset:
    """Run the chain; returns rows + FLAG_* columns + QCF + filtered
    value (and, if resample_width_us is set, the rolled-up tier of the
    QCF-filtered series instead)."""
    v, keys, ts_col = spec.value_col, list(spec.keys), spec.ts_col

    if spec.cap_max is not None:
        ds = setto_threshold(ds, v, spec.cap_max, "max")
    if spec.cap_min is not None:
        ds = setto_threshold(ds, v, spec.cap_min, "min")

    tests = list(spec.tests)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        work = df[v].astype(float).copy()
        for name, kwargs in tests:
            kernel = ol.KERNELS[name]
            flag = kernel(work, **kwargs)
            df[f"FLAG_{v}_{name.upper()}_TEST"] = flag.to_numpy()
            work[flag == 2] = np.nan  # stepwise addflag masking
        df = qcf_frame(df)
        filtered = df[v].astype(float).copy()
        filtered[df["FLAG_QCF_TEST"].to_numpy() == 2] = np.nan
        df[f"{v}_QCF_FILTERED"] = filtered
        return df

    flagged = grouped_block_map(ds, keys, gfn)
    if spec.resample_width_us is None:
        return flagged

    width = spec.resample_width_us
    minc = (
        mincounts_30min_rule(width // spec.raw_width_us, spec.mincounts_perc)
        if (spec.mincounts_perc > 0 and spec.raw_width_us)
        else 1
    )
    fcol = f"{v}_QCF_FILTERED"

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df[ts_col])
        base = {k: df[k].to_numpy() for k in keys}
        base["b"] = bucket_end_us(us, width, end_stamped=spec.end_stamped)
        base["v"] = df[fcol].to_numpy()
        g = (
            pd.DataFrame(base)
            .groupby(keys + ["b"], as_index=False, sort=False)
            .agg(count=("v", "count"), sum=("v", "sum"), min=("v", "min"), max=("v", "max"))
        )
        g = g[g["count"] >= max(1, minc)]
        g["mean"] = g["sum"] / g["count"]
        g["bucket_ts"] = pd.to_datetime(g.pop("b"), unit="us")
        return g[keys + ["bucket_ts", "count", "sum", "min", "max", "mean"]]

    # flagged blocks are already key-partitioned; buckets never span keys
    return flagged.map_batches(roll, batch_format="pandas", batch_size=None)
