"""Multi-year DOY cumulative curves (stages/cumulative.py vs reference
times.py:1935-1996). The driver query uses synthetic integer years; this
pins REAL calendar semantics: the distributed two-exchange stage must
reproduce the reference's pivot→cumsum→across-year-moments path on a
multi-year hourly series with gaps, including excluded years and the
missing-(year, DOY_TIME) skipna behavior."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.cumulative import (
    doy_cumulatives_per_year_frame,
    doy_mean_cumulative_frame,
    doy_timefraction_frame,
)


@pytest.fixture(scope="module")
def series():
    rng = np.random.Generator(np.random.Philox(key=[23, 2026]))
    idx = pd.date_range("2019-01-01 01:00", "2021-12-31 23:00", freq="h")
    s = pd.Series(rng.normal(5.0, 2.0, size=len(idx)), index=idx, name="flux")
    # knock out some hours in 2020 so years cover different DOY_TIMEs
    mask = rng.random(len(idx)) < 0.05
    return s[~(mask & (idx.year == 2020))]


def test_timefraction_frame_matches_reference(series):
    df = doy_timefraction_frame(series)
    assert (df["DOY_TIME"] == df.index.dayofyear
            + (df.index.hour + df.index.minute / 60 + df.index.second / 3600) / 24).all()
    assert df["YEAR"].unique().tolist() == [2019, 2020, 2021]


def _expected_stats(series, excl=()):
    cum = doy_cumulatives_per_year_frame(series)
    return doy_mean_cumulative_frame(cum, list(excl))


def _distributed_stats(series, excl=(), blocks=7):
    import ray.data as rd

    from diive_ray.stages.cumulative import doy_cumulative_stats

    df = pd.DataFrame({
        "key": "k",
        "ts_us": series.index.astype("datetime64[us]").astype(np.int64),
        "year": series.index.year.astype(np.int64),
        "doy": series.index.dayofyear.astype(np.int64),
        "sec_of_day": (series.index.hour * 3600 + series.index.minute * 60
                       + series.index.second).astype(np.int64),
        "v": series.to_numpy(),
    })
    out = doy_cumulative_stats(
        rd.from_pandas(df).repartition(blocks), ["key"],
        value_col="v", order_col="ts_us", excl_years=tuple(excl),
        num_partitions=5,
    ).to_pandas()
    out["DOY_TIME"] = out["doy"] + out["sec_of_day"] / 86_400.0
    return out.sort_values("DOY_TIME").reset_index(drop=True)


def test_distributed_matches_reference_pivot(series, ray_session):
    got = _distributed_stats(series)
    want = _expected_stats(series)
    # reference DOY_TIME = doy + (h + m/60 + s/3600)/24; engine key is
    # (doy, sec) with DOY_TIME derived — align on rounded index
    want = want.reset_index().rename(columns={"index": "DOY_TIME"})
    merged = got.merge(
        want.assign(DT=want["DOY_TIME"].round(9)),
        left_on=got["DOY_TIME"].round(9), right_on="DT", how="outer",
    )
    assert len(merged) == len(got) == len(want)
    np.testing.assert_allclose(
        merged["mean_doy_time"], merged["MEAN_DOY_TIME"], rtol=1e-12)
    np.testing.assert_allclose(
        merged["sd_doy_time"], merged["SD_DOY_TIME"], rtol=1e-12)
    np.testing.assert_allclose(
        merged["mean_plus_196sd"], merged["MEAN+1.96_SD"], rtol=1e-12)
    np.testing.assert_allclose(
        merged["mean_minus_sd"], merged["MEAN-SD"], rtol=1e-12)
    # gap hours in 2020 -> 2-year rows; leap-only DOY 366 -> 1-year rows
    assert set(merged["n_years"].unique()) == {1, 2, 3}
    assert (merged.loc[merged["n_years"] == 1, "sd_doy_time"].isna()).all()


def test_excluded_year_drops_from_reference_stats(series, ray_session):
    got = _distributed_stats(series, excl=(2020,))
    want = _expected_stats(series, excl=(2020,))
    np.testing.assert_allclose(
        got["mean_doy_time"].to_numpy(),
        want["MEAN_DOY_TIME"].to_numpy(), rtol=1e-12)
    assert got["n_years"].max() == 2
