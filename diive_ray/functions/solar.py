"""Solar geometry + day/night flagging.

Reference: ``potrad`` (diive/variables/radiation.py:15-99) computes
potential shortwave radiation from timestamp + lat/lon;
``DaytimeNighttimeFlag`` (diive/variables/temporal.py:19-111) flags
daytime where potential radiation exceeds a threshold (default
20 W m^-2, temporal.py:64).

This implementation uses the standard simplified solar-position model
(declination = -23.44 deg * cos(2*pi*(doy+10)/365.25); hour angle from
UTC time + longitude; sin(elevation) = sin(lat)sin(decl) +
cos(lat)cos(decl)cos(h)) with top-of-atmosphere irradiance 1367 W m^-2
— deterministic closed-form per row, exactly reproducible in the SQL
oracle (sin/cos/radians are ANSI)."""

from __future__ import annotations

import numpy as np

SOLAR_CONSTANT = 1367.0
DAYTIME_THRESHOLD = 20.0


def potential_radiation(ts_us: np.ndarray, lat: float, lon: float) -> np.ndarray:
    """Potential shortwave radiation (W m^-2) per END-labeled stamp."""
    sec = ts_us.astype(np.float64) / 1e6
    doy = (sec / 86_400.0) % 365.25
    hour_utc = (sec % 86_400.0) / 3_600.0
    decl = np.radians(-23.44) * np.cos(2.0 * np.pi * (doy + 10.0) / 365.25)
    solar_time = hour_utc + lon / 15.0
    hour_angle = np.radians(15.0 * (solar_time - 12.0))
    lat_r = np.radians(lat)
    sin_elev = np.sin(lat_r) * np.sin(decl) + np.cos(lat_r) * np.cos(decl) * np.cos(hour_angle)
    return SOLAR_CONSTANT * np.maximum(sin_elev, 0.0)


def daytime_flag(ts_us: np.ndarray, lat: float, lon: float, threshold: float = DAYTIME_THRESHOLD) -> np.ndarray:
    """1 = daytime (potential radiation > threshold), 0 = nighttime
    (temporal.py:64-111 rule)."""
    return (potential_radiation(ts_us, lat, lon) > threshold).astype(np.int8)


def potential_radiation_eot(
    ts_us: np.ndarray,
    lat: float,
    lon: float,
    utc_offset: int,
    *,
    use_atmospheric_transmission: bool = False,
) -> np.ndarray:
    """Potential shortwave radiation with the full equation-of-time
    model (reference diive/variables/radiation.py:15-99, potrad_eot):
    solstice-anchored declination, Woolf's 1968 EoT, solar hour angle
    from local->UTC time + longitude + EoT, eccentricity-corrected TOA
    irradiance (S=1361), optional Beer-Lambert clear-sky transmission
    (tau=0.75, air mass 1/max(sin_psi, 0.01)), night clamped to 0.

    Expression order matches the reference exactly so the SQL oracle
    replays it; calendar day-of-year comes from the UTC-shifted stamp
    (EXTRACT(doy) semantics, leap-aware)."""
    import pandas as pd

    idx = pd.to_datetime(np.asarray(ts_us, dtype=np.int64), unit="us")
    utc = idx - pd.Timedelta(hours=utc_offset)
    doy = utc.dayofyear.to_numpy(dtype=np.float64)
    utc_h = (utc.hour + utc.minute / 60.0 + utc.second / 3600.0).to_numpy(
        dtype=np.float64)

    phi_r = np.deg2rad(23.45)
    phi = np.deg2rad(lat)
    delta = phi_r * np.cos(2 * np.pi * (doy - 173) / 365.25)
    B = 2 * np.pi * (doy - 81) / 365.0
    eot_h = (9.87 * np.sin(2 * B) - 7.53 * np.cos(B) - 1.5 * np.sin(B)) / 60.0
    H_rad = (utc_h + lon / 15.0 + eot_h - 12) * (np.pi / 12)
    sin_psi = (np.sin(phi) * np.sin(delta)
               + np.cos(phi) * np.cos(delta) * np.cos(H_rad))
    ecc = 1 + 0.033 * np.cos(2 * np.pi * doy / 365.0)
    rad = 1361 * ecc * sin_psi
    if use_atmospheric_transmission:
        M = 1 / np.maximum(sin_psi, 0.01)
        rad = rad * (0.75 ** M)
    return np.where(rad < 0, 0.0, rad)
