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
