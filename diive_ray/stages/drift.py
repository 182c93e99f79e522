"""Distribution-drift statistics between corpus sources: exact
two-sample Kolmogorov-Smirnov over a bounded value grid.

Engine addition for the training-data mission (data-mixing QA: detect
a source whose length/quality distribution shifted between snapshots
or diverges from the blend). No reference counterpart; the reference's
closest tool is the per-bin percentile matrix
(diive/analysis/quantilexyaggz.py-style grids).

Scale contract: the statistic is computed on per-(source, value)
COUNTS — one vectorized per-batch partial + a tiny driver combine
(``driver_combine``), so the corpus is never collected. The grid of
distinct values must be bounded (integers like character/token counts,
or pre-bucketed floats — bucket continuous columns upstream with
``np.digitize`` to keep |grid| x |sources| small); the ECDF cumsum and
the all-pairs max-|dF| sweep run on that small matrix driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ks_pairwise(ds, value_col: str, key_col: str = "source") -> pd.DataFrame:
    """Exact two-sample KS statistic for every unordered key pair:
    ``KS = max_v |ECDF_a(v) - ECDF_b(v)|`` over the union value grid.
    Returns (key_a, key_b, n_a, n_b, ks) with key_a < key_b."""
    from .exchange import driver_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, value_col], sort=False).size()
        out = g.rename("n").reset_index()
        return out

    counts = driver_combine(
        ds, partial,
        lambda df: df.groupby([key_col, value_col], as_index=False)["n"].sum(),
        batch_format="pandas",
    )
    if counts.empty:
        return pd.DataFrame({"key_a": [], "key_b": [], "n_a": [], "n_b": [], "ks": []})

    # (values x sources) count matrix -> column-normalized cumulative ECDFs
    pivot = counts.pivot_table(index=value_col, columns=key_col, values="n",
                               aggfunc="sum", fill_value=0).sort_index()
    mat = pivot.to_numpy(dtype=np.int64)
    totals = mat.sum(axis=0)
    ecdf = np.cumsum(mat, axis=0) / totals[None, :]

    keys = list(pivot.columns)
    rows = []
    for i in range(len(keys)):
        # vectorized over all partners of key i at once
        d = np.abs(ecdf[:, i + 1:] - ecdf[:, [i]]).max(axis=0)
        for j, ksv in enumerate(d, start=i + 1):
            a, b = sorted((keys[i], keys[j]))
            rows.append((a, b, int(totals[keys.index(a)]),
                         int(totals[keys.index(b)]), float(ksv)))
    return pd.DataFrame(rows, columns=["key_a", "key_b", "n_a", "n_b", "ks"]) \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
