"""Thermodynamic battery (functions/scalars.py vs verbatim
thermodynamic.py replicas) and lagged_variants naming/shift semantics
(temporal.py:367-440)."""

import numpy as np
import pandas as pd

from diive_ray.functions.scalars import (
    aerodynamic_resistance,
    air_temp_from_sonic_temp,
    dry_air_density,
    et_from_le,
    latent_heat_of_vaporization,
)


def test_thermo_formulas_verbatim():
    rng = np.random.Generator(np.random.Philox(key=[59, 2026]))
    u = rng.uniform(0.1, 10, 50)
    ustar = rng.uniform(-0.2, 1.0, 50)
    ta = rng.uniform(-10, 35, 50)
    le = rng.uniform(-50, 400, 50)

    # reference: ustar<=0 -> NaN, ra = u / ustar**2
    uc = ustar.copy()
    uc[uc <= 0] = np.nan
    np.testing.assert_array_equal(aerodynamic_resistance(u, ustar), u / uc ** 2)
    assert np.isnan(aerodynamic_resistance(np.array([1.0]), np.array([0.0])))[()]

    np.testing.assert_array_equal(
        dry_air_density(np.array([1.2]), np.array([0.01])), np.array([1.19]))

    sonic, h2o = np.array([300.0]), np.array([0.02])
    np.testing.assert_array_equal(
        air_temp_from_sonic_temp(sonic, h2o), sonic / (1 + 0.32 * h2o))

    lv = latent_heat_of_vaporization(ta)
    np.testing.assert_array_equal(lv, (2.501 - 0.00237 * ta) * 10 ** 6)
    # ET = LE / Lv * 3600 in mm h-1; 400 W m-2 at 20 C ~ 0.59 mm h-1
    et = et_from_le(le, ta)
    np.testing.assert_array_equal(et, le / lv * 3600)
    at20 = et_from_le(np.array([400.0]), np.array([20.0]))[0]
    assert 0.55 < at20 < 0.62


def test_lagged_variant_naming_and_shifts():
    s = pd.Series([10.0, 20.0, 30.0, 40.0])
    out = pd.DataFrame({"mean": s})
    for k in (-2, -1, 1):
        name = f"mean{'-' if k < 0 else '+'}{abs(k)}"
        out[name] = out["mean"].shift(-k if k > 0 else abs(k))
    # reference semantics: 'X-1' = one record BEFORE (prior value),
    # 'X+1' = one record AFTER (next value)
    assert out.loc[2, "mean-1"] == 20.0
    assert out.loc[2, "mean-2"] == 10.0
    assert out.loc[2, "mean+1"] == 40.0
    assert np.isnan(out.loc[0, "mean-1"]) and np.isnan(out.loc[3, "mean+1"])
