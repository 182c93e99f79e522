"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd


def ts_to_us(x) -> np.ndarray:
    """int64 microseconds-since-epoch from any datetime64 resolution.

    Different stages hand back different datetime64 units (Arrow
    timestamp[us] -> pandas may surface as datetime64[s]/[us]/[ns]
    depending on the conversion path); a bare ``astype(int64)`` silently
    yields unit-dependent integers, so always normalize first.
    """
    if isinstance(x, pd.Series):
        x = x.to_numpy()
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.datetime64):
        return x.astype(np.int64)
    return x.astype("datetime64[us]").astype(np.int64)
