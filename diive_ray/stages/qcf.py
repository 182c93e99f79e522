"""QCF — overall quality-control flag from individual test flags.

Pure row-wise column algebra (no shuffle): reference
diive/preprocessing/qaqc/qcf.py:637-696.

* flag sums (qcf.py:680-696): SUM_HARDFLAGS = sum of flag values equal
  to 2 across all ``FLAG_*_TEST`` columns (so 2 per hard flag),
  SUM_SOFTFLAGS = sum of values equal to 1, SUM_FLAGS = their sum.
* decision rules (qcf.py:637-678):
  QCF=0 if SUM_FLAGS==0; QCF=2 if SUM_SOFTFLAGS>3 or SUM_HARDFLAGS>=2;
  QCF=1 if 1<=SUM_SOFTFLAGS<=3 and SUM_HARDFLAGS==0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def qcf_frame(df: pd.DataFrame, flag_cols: list[str] | None = None) -> pd.DataFrame:
    """Append SUM_HARDFLAGS / SUM_SOFTFLAGS / SUM_FLAGS / FLAG_QCF_TEST."""
    if flag_cols is None:
        flag_cols = [c for c in df.columns if str(c).startswith("FLAG_") and str(c).endswith("_TEST")
                     and c != "FLAG_QCF_TEST"]
    flags = df[flag_cols]
    sumhard = flags[flags == 2].sum(axis=1)
    sumsoft = flags[flags == 1].sum(axis=1)
    sumflags = sumhard.add(sumsoft)
    qcf = np.full(len(df), np.nan)
    qcf[(sumflags == 0).to_numpy()] = 0
    qcf[(sumsoft > 3).to_numpy()] = 2
    qcf[(sumhard >= 2).to_numpy()] = 2
    one = ((sumsoft <= 3) & (sumsoft >= 1) & (sumhard == 0)).to_numpy()
    qcf[one] = 1
    df = df.copy()
    df["SUM_HARDFLAGS"] = sumhard.astype(np.int64)
    df["SUM_SOFTFLAGS"] = sumsoft.astype(np.int64)
    df["SUM_FLAGS"] = sumflags.astype(np.int64)
    df["FLAG_QCF_TEST"] = qcf.astype(np.int8)
    return df


def flag_qcf(
    ds: ray.data.Dataset,
    *,
    value_col: str | None = None,
    flag_cols: list[str] | None = None,
    filtered_col: str | None = None,
) -> ray.data.Dataset:
    """Stateless map_batches QCF stage. With ``value_col``, also emits
    ``filtered_col`` (default ``{value_col}_QCF_FILTERED``) = value where
    QCF < 2, else null (the reject rule of qcf.py:674-678)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = qcf_frame(df, flag_cols)
        if value_col is not None:
            col = filtered_col or f"{value_col}_QCF_FILTERED"
            v = out[value_col].astype(float).copy()
            v[out["FLAG_QCF_TEST"] == 2] = np.nan
            out[col] = v
        return out

    return ds.map_batches(fn, batch_format="pandas")
