"""potential_radiation_eot (functions/solar.py) vs a verbatim replica
of reference radiation.py:15-99 potrad_eot, plus physical sanity."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.functions.solar import potential_radiation_eot


def _ref(idx: pd.DatetimeIndex, lat, lon, utc_offset, use_atm=False) -> np.ndarray:
    S_SC, d_y, d_r = 1361, 365.25, 173
    phi_r, phi = np.deg2rad(23.45), np.deg2rad(lat)
    utc = idx - pd.Timedelta(hours=utc_offset)
    doy = utc.dayofyear.to_numpy(dtype=float)
    utc_h = (utc.hour + utc.minute / 60.0 + utc.second / 3600.0).to_numpy(dtype=float)
    delta = phi_r * np.cos(2 * np.pi * (doy - d_r) / d_y)
    B = 2 * np.pi * (doy - 81) / 365.0
    eot_h = (9.87 * np.sin(2 * B) - 7.53 * np.cos(B) - 1.5 * np.sin(B)) / 60.0
    H = (utc_h + lon / 15.0 + eot_h - 12) * (np.pi / 12)
    sin_psi = np.sin(phi) * np.sin(delta) + np.cos(phi) * np.cos(delta) * np.cos(H)
    rad = S_SC * (1 + 0.033 * np.cos(2 * np.pi * doy / 365.0)) * sin_psi
    if use_atm:
        rad = rad * (0.75 ** (1 / np.clip(sin_psi, 0.01, None)))
    rad = np.asarray(rad)
    rad[rad < 0] = 0
    return rad


@pytest.mark.parametrize("use_atm", [False, True])
def test_matches_reference_bitwise(use_atm):
    idx = pd.date_range("2024-01-01", "2024-12-31 23:00", freq="7h")
    ts_us = idx.astype("datetime64[us]").astype(np.int64).to_numpy()
    got = potential_radiation_eot(
        ts_us, 47.0, 8.0, 1, use_atmospheric_transmission=use_atm)
    want = _ref(idx, 47.0, 8.0, 1, use_atm)
    np.testing.assert_array_equal(got, want)


def test_physical_sanity():
    noon = pd.DatetimeIndex(["2024-06-21 12:00", "2024-12-21 12:00",
                             "2024-06-21 00:30"])
    ts_us = noon.astype("datetime64[us]").astype(np.int64).to_numpy()
    r = potential_radiation_eot(ts_us, 47.0, 8.0, 1)
    assert r[0] > 1100                      # summer solstice noon, TOA
    assert 0 < r[1] < r[0]                  # winter noon lower but lit
    assert r[2] == 0.0                      # after midnight dark
    clear = potential_radiation_eot(
        ts_us, 47.0, 8.0, 1, use_atmospheric_transmission=True)
    assert (clear <= r + 1e-9).all() and clear[0] > 700
