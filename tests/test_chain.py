"""Composable Chain API: step registry, end-to-end run, user extension."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.pipelines.chain import Chain, Step, register_step
from diive_ray.schema import US_PER_HOUR


@pytest.fixture(scope="module")
def minutes(ray_session):
    n = 24 * 60
    ts = pd.date_range("2024-01-01", periods=n, freq="min")
    rng = np.random.Generator(np.random.Philox(key=51))
    v = 100 + rng.standard_normal(n)
    v[::500] = 5000.0  # spikes
    return rd.from_pandas(pd.DataFrame({"source": "a", "ts": ts, "value": v})).repartition(3)


def test_chain_end_to_end(minutes):
    chain = Chain([
        Step("setto_threshold", col="value", threshold=4000.0, type="max"),
        Step("flag_outliers", method="abs_limits", value_col="value",
             keys=("source",), minval=0.0, maxval=200.0),
        Step("qcf", value_col="value"),
        Step("rollup", width_us=US_PER_HOUR, value_col="value_QCF_FILTERED",
             keys=("source",), end_stamped=False),
    ])
    out = chain.run(minutes).to_pandas()
    assert len(out) == 24
    # spikes (capped to 4000, then hard-flagged by abs_limits) never
    # reach the rollup
    assert out["max"].max() <= 200.0
    assert (out["count"] >= 57).all()


def test_chain_intermediates_and_custom_step(minutes):
    def double(ds, *, col):
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda t: t.set_column(t.column_names.index(col), col,
                                   pc.multiply(t[col], 2.0)),
            batch_format="pyarrow",
        )

    register_step("double", double)
    chain = Chain([Step("double", col="value"), Step("double", col="value")])
    final, mids = chain.run(minutes, collect_intermediate=True)
    assert len(mids) == 2
    a = minutes.to_pandas().sort_values("ts")["value"].to_numpy()
    b = final.to_pandas().sort_values("ts")["value"].to_numpy()
    np.testing.assert_allclose(b, a * 4.0)


def test_chain_unknown_step_raises(minutes):
    with pytest.raises(KeyError):
        Chain([Step("nope")]).run(minutes)


def test_chain_gapfill_score_step(minutes):
    """Terminal gapfill_score step == rollup then direct
    planted_gap_fill_scores on the rolled output (VERDICT r3 #9: the
    chain reports per-fill scores the way run_chain's fill levels do)."""
    from diive_ray.stages.scores import planted_gap_fill_scores
    from diive_ray.util import stable_round6

    base = Chain([
        Step("rollup", width_us=US_PER_HOUR, value_col="value", keys=("source",)),
    ]).run(minutes)

    def rnd(df):
        df = df.copy()
        df["mean"] = stable_round6(df["mean"].astype(float))
        return df

    want = planted_gap_fill_scores(
        base.map_batches(rnd, batch_format="pandas"), ["source"],
        value_col="mean", order_col="bucket_ts",
        hide_every=5, hide_phase=2, interp_limit=2,
    )

    got = Chain([
        Step("rollup", width_us=US_PER_HOUR, value_col="value", keys=("source",)),
        Step("gapfill_score", keys=["source"], value_col="mean",
             order_col="bucket_ts", hide_every=5, hide_phase=2, interp_limit=2),
    ]).run(minutes).to_pandas()

    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    assert got["n_scored"].iloc[0] > 0
    assert np.isfinite(got["r2"].iloc[0])
