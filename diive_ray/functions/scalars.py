"""Scalar/column functions: EddyPro-style digit flags, column-name
sanitation, numeric coercion, thermodynamic derived variables.

References:
* digit-encoded quality flags — diive/preprocessing/qaqc/eddyproflags.py
  :31-506 parses multi-digit flag integers into per-test 0/1/2 flags
  via integer math (also diive/io/binary/extract.py); here a vectorized
  base-10 digit extractor.
* duplicate column-name dedup (``_1``/``_2`` suffixes) —
  diive/core/io/filereader.py:156-231 ColumnNamesSanitizer.
* numeric coercion — diive/core/dfun/frames.py:361-373.
* VPD from air temperature + relative humidity —
  diive/variables/thermodynamic.py:93-133 (Magnus saturation vapor
  pressure over water, hPa -> kPa deficit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def extract_digit(flags: np.ndarray, position: int, n_digits: int) -> np.ndarray:
    """Digit at ``position`` (0 = leftmost) of an ``n_digits``-wide
    flag integer, vectorized: e.g. extract_digit(812, 0, 3) == 8."""
    f = np.asarray(flags, dtype=np.int64)
    div = 10 ** (n_digits - 1 - position)
    return (f // div) % 10


def eddypro_ssitc_flags(batch: pa.Table, flag_col: str, n_digits: int) -> pa.Table:
    """Explode an n-digit flag integer column into FLAG_D{i}_TEST int8
    columns (eddyproflags.py pattern)."""
    f = batch[flag_col].to_numpy(zero_copy_only=False)
    for i in range(n_digits):
        d = extract_digit(f, i, n_digits).astype(np.int8)
        batch = batch.append_column(f"FLAG_D{i}_TEST", pa.array(d))
    return batch


def sanitize_column_names(names: list[str]) -> list[str]:
    """Dedup duplicate names with _1/_2 suffixes (filereader.py:197-231)."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n not in seen:
            seen[n] = 0
            out.append(n)
        else:
            seen[n] += 1
            candidate = f"{n}_{seen[n]}"
            while candidate in seen:
                seen[n] += 1
                candidate = f"{n}_{seen[n]}"
            seen[candidate] = 0
            out.append(candidate)
    return out


def convert_to_numeric(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Coerce string columns to float64, unparseable -> null
    (frames.py:361-373 convert_data_to_numeric)."""
    cols = columns or [
        n for n, t in zip(batch.column_names, batch.schema.types) if pa.types.is_string(t)
    ]
    for name in cols:
        arr = batch[name]
        try:
            casted = pc.cast(arr, pa.float64())
        except pa.ArrowInvalid:
            vals = pd.to_numeric(pd.Series(arr.to_pylist()), errors="coerce")
            casted = pa.array(vals, pa.float64())
        batch = batch.set_column(batch.column_names.index(name), name, casted)
    return batch


def saturation_vapor_pressure_kpa(ta_c: np.ndarray) -> np.ndarray:
    """Magnus formula over water, kPa (thermodynamic.py:19-60)."""
    return 0.61078 * np.exp(17.27 * ta_c / (ta_c + 237.3))


def calc_vpd_from_ta_rh(ta_c: np.ndarray, rh_pct: np.ndarray) -> np.ndarray:
    """Vapor-pressure deficit, kPa (thermodynamic.py:93-133):
    VPD = es(TA) * (1 - RH/100), negative clipped to 0."""
    vpd = saturation_vapor_pressure_kpa(np.asarray(ta_c, float)) * (
        1.0 - np.asarray(rh_pct, float) / 100.0
    )
    return np.maximum(vpd, 0.0)


def flag_hard_digit(codes: np.ndarray, position: int, n_digits: int,
                    *, hard: bool = True) -> np.ndarray:
    """DIIVE-format flag from one digit of a multi-digit EddyPro code
    (eddyproflags.py:31-58 _extract_and_convert_flag_from_multidigit):
    digit 9 (and missing input) -> NaN, and for hard-flag tests a raw
    1 becomes 2 (bad). Vectorized on top of extract_digit."""
    c = np.asarray(codes, dtype=np.float64)
    missing = np.isnan(c)
    raw = extract_digit(np.where(missing, 0, c).astype(np.int64),
                        position, n_digits).astype(np.float64)
    out = np.where(raw == 9, np.nan, raw)
    if hard:
        out = np.where(out == 1, 2.0, out)
    out[missing] = np.nan
    return out


def flag_high_good(x: np.ndarray, thres_good: float, thres_ok: float) -> np.ndarray:
    """0/1/2 flag where HIGHER is better (completeness test,
    eddyproflags.py:341-408, Sabbatini 2018 thresholds): 0 at
    >= thres_good, 1 at [thres_ok, thres_good), else 2; NaN in -> NaN."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full(x.shape, np.nan)
    out[x >= thres_good] = 0.0
    out[(x >= thres_ok) & (x < thres_good)] = 1.0
    out[x < thres_ok] = 2.0
    return out


def flag_low_good(x: np.ndarray, thres_good: float, thres_ok: float) -> np.ndarray:
    """0/1/2 flag where LOWER is better (spectral correction factor
    test, eddyproflags.py:409-454): 0 below thres_good, 1 in
    [thres_good, thres_ok), 2 at/above thres_ok; NaN in -> NaN."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full(x.shape, np.nan)
    out[x < thres_good] = 0.0
    out[(x >= thres_good) & (x < thres_ok)] = 1.0
    out[x >= thres_ok] = 2.0
    return out


def aerodynamic_resistance(u_ms: np.ndarray, ustar_ms: np.ndarray) -> np.ndarray:
    """ra = u / ustar^2 (Stull 1988 bulk momentum approach;
    variables/thermodynamic.py:19-49), ustar <= 0 -> NaN."""
    ustar = np.where(np.asarray(ustar_ms) <= 0, np.nan, np.asarray(ustar_ms, dtype=np.float64))
    return np.asarray(u_ms, dtype=np.float64) / (ustar ** 2)


def dry_air_density(rho_a: np.ndarray, rho_v: np.ndarray) -> np.ndarray:
    """rho_d = rho_total - rho_vapor (thermodynamic.py:52-91)."""
    return np.asarray(rho_a, dtype=np.float64) - np.asarray(rho_v, dtype=np.float64)


def air_temp_from_sonic_temp(sonic_temp: np.ndarray, h2o: np.ndarray) -> np.ndarray:
    """ta = sonic / (1 + 0.32 * h2o) — humidity (mmol mol-1 -> mol
    fraction upstream) crosswind-corrected sonic temperature
    (thermodynamic.py:134-170)."""
    return np.asarray(sonic_temp, dtype=np.float64) / (1 + 0.32 * np.asarray(h2o, dtype=np.float64))


def latent_heat_of_vaporization(ta_c: np.ndarray) -> np.ndarray:
    """Lv = (2.501 - 0.00237 * TA) * 10^6 J kg-1 (Stull 1988;
    thermodynamic.py:172-199)."""
    return (2.501 - 0.00237 * np.asarray(ta_c, dtype=np.float64)) * (10 ** 6)


def et_from_le(le: np.ndarray, ta_c: np.ndarray) -> np.ndarray:
    """Evapotranspiration (mm h-1) from latent heat flux (W m-2):
    ET = LE / Lv(TA) * 3600 (thermodynamic.py:201-240)."""
    return np.asarray(le, dtype=np.float64) / latent_heat_of_vaporization(ta_c) * 3600
