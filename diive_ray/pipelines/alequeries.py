"""Driver-analysis queries: ALE response curves + permutation importance.

Reference anchors: /root/reference/diive/analysis/driveranalysis/ale.py
(ALE estimators), driveranalysis.py:49-66,388-402 (noise-floor
relevance). `ale_fixed_grid` pins the full distributed ALE machinery
(bin rule, per-bin averaging, accumulation, weighted centering) to an
exact DuckDB oracle by using a deterministic closed-form model and a
literal bin grid; the quantile-edge + fitted-forest paths are covered by
`ale_response` / `driver_importance` (model-based -> rows-only) and by
pytest pins against the in-memory reference-spec implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..stages.ale import (
    RANDOM_COL,
    ale_1d,
    exact_quantile_edges,
    permutation_importance,
)
from ..util import round6, stable_round6, ts_to_us

US_PER_HOUR = 3_600_000_000

# Literal bin grid for the oracle-pinned ALE query (events.value spans
# ~[0, 500] at the driver's sf; outliers clip into the end bins exactly
# like the searchsorted clip in stages/ale.py).
ALE_GRID = [0.0, 5.0, 10.0, 20.0, 35.0, 60.0, 100.0, 160.0, 250.0, 400.0, 600.0]


def poly_predict(_payload, X: np.ndarray) -> np.ndarray:
    """Deterministic closed-form 'model' for the oracle-pinned query.
    The SQL oracle spells out the IDENTICAL expression (left-associative
    multiplication, same literal coefficients) so per-row deltas agree
    bit-for-bit before summation."""
    x, h = X[:, 0], X[:, 1]
    return 2.0 * x + 0.1 * h * h + 0.5 * x * h


def q_ale_fixed_grid(sf_dir: str) -> pd.DataFrame:
    """1D ALE over the events table: features (x=value, h=hour-of-day),
    literal grid, closed-form model. Exercises _AleDelta's two-eval
    batch kernel + driver accumulation/centering end-to-end."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df["ts"])
        return pd.DataFrame(
            {
                "x": df["value"].astype(float),
                "h": ((us // US_PER_HOUR) % 24).astype(np.float64),
            }
        )

    feat = ds.map_batches(featurize, batch_format="pandas")
    model_ref = ray.put(None)
    out = ale_1d(
        feat,
        model_ref,
        poly_predict,
        ["x", "h"],
        "x",
        edges=np.array(ALE_GRID),
    )
    out["ale"] = stable_round6(out["ale"].astype(float))
    out["edge_idx"] = out["edge_idx"].astype("int64")
    out["bin_count"] = out["bin_count"].astype("int64")
    return out.sort_values("edge_idx").reset_index(drop=True)


DRIVER_FEATS = ["sec_of_day", "day_of_week", "user_bucket", RANDOM_COL]


def _analysis_frame(sf_dir: str):
    """Per-row driver matrix straight off the events table: temporal +
    cohort drivers for the `value` target, plus the deterministic
    .RANDOM noise column keyed on event_id (driveranalysis.py:49-66
    noise floor, reproducible under any partitioning). Pure map_batches
    — no shuffle, streams at any scale."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df["ts"])
        ids = df["event_id"].to_numpy(dtype=np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "sec_of_day": ((us // 1_000_000) % 86_400).astype(np.float64),
                "day_of_week": ((us // 86_400_000_000 + 4) % 7).astype(np.float64),
                "user_bucket": (df["user_id"].to_numpy(dtype=np.int64) % 16).astype(
                    np.float64
                ),
                RANDOM_COL: h.astype(np.float64) / float(1 << 24),
                "value": df["value"].astype(float),
            }
        )

    return ds.map_batches(featurize, batch_format="pandas")


from functools import lru_cache


@lru_cache(maxsize=4)
def _analysis_ds(sf_dir: str):
    """Materialized analysis frame shared by the fit / edges /
    importance / ALE passes (6+ topologies otherwise re-reading and
    re-featurizing the source; the projected frame is 5 narrow columns,
    far smaller than the raw table, so pinning it in the object store
    is the right trade — it spills if it must)."""
    return _analysis_frame(sf_dir).materialize()


def forest_predict(payload, X: np.ndarray) -> np.ndarray:
    from ..stages import trees as tr

    return tr.predict_forest(payload, X)


@lru_cache(maxsize=4)
def _fit_driver_forest(sf_dir: str, cap: int = 200_000, seed: int = 42):
    """Train one global forest value<-drivers on a bounded deterministic
    hash-sample of the analysis frame (the reference fits one model on
    the full in-memory frame, driveranalysis.py:449; at 100 TB the
    bounded hash-sample is the honest single-model analogue). Cached so
    the importance and ALE queries share one fit."""
    from ..stages import trees as tr

    frame = _analysis_ds(sf_dir)
    n = frame.count()
    frac = min(1.0, cap / max(n, 1))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if frac >= 1.0:
            return df
        ids = df["event_id"].to_numpy(dtype=np.uint64)
        h = (ids * np.uint64(0xD6E8FEB86659FD93)) >> np.uint64(32)
        return df[(h.astype(np.float64) / float(1 << 32)) < frac]

    sample = frame.map_batches(keep, batch_format="pandas").to_pandas()
    sample = sample.dropna(subset=DRIVER_FEATS + ["value"])
    X = sample[DRIVER_FEATS].to_numpy(dtype=np.float64)
    y = sample["value"].to_numpy(dtype=np.float64)
    model = tr.fit_forest(X, y, seed=seed, n_trees=10, max_depth=6)
    return model


def q_driver_importance(sf_dir: str) -> pd.DataFrame:
    """Permutation importance (SHAP stand-in, lib absent) of temporal /
    cohort drivers for the event value, with the .RANDOM noise-floor
    ternary relevance rule. Seeded + content-seeded permutations ->
    deterministic, but model-based -> rows-only."""
    model = _fit_driver_forest(sf_dir)
    model_ref = ray.put(model)
    out = permutation_importance(
        _analysis_ds(sf_dir), model_ref, forest_predict,
        DRIVER_FEATS, "value", seed=42,
    )
    out["importance"] = stable_round6(out["importance"].astype(float))
    out["baseline_mse"] = round6(out["baseline_mse"].astype(float))
    return out.sort_values(
        ["importance", "feature"], ascending=[False, True]
    ).reset_index(drop=True)


def q_ale_response(sf_dir: str) -> pd.DataFrame:
    """ALE response curve of the fitted forest for the diurnal driver,
    with exact distributed quantile edges (np.quantile parity via the
    3-pass selector). Model-based -> rows-only; spec pinned by
    tests/test_ale.py against the in-memory reference implementation."""
    model = _fit_driver_forest(sf_dir)
    feature = "sec_of_day"
    model_ref = ray.put(model)
    out = ale_1d(
        _analysis_ds(sf_dir), model_ref, forest_predict,
        DRIVER_FEATS, feature,
        grid_size=10, id_col="event_id",
    )
    out.insert(0, "feature", feature)
    out["ale"] = stable_round6(out["ale"].astype(float))
    out["bin_edge"] = round6(out["bin_edge"].astype(float))
    out["edge_idx"] = out["edge_idx"].astype("int64")
    out["bin_count"] = out["bin_count"].astype("int64")
    return out.sort_values("edge_idx").reset_index(drop=True)


def _ale_fixed_sql() -> str:
    e = ALE_GRID
    nb = len(e) - 1
    case = " ".join(
        f"WHEN x <= {e[k]!r} THEN {k}" for k in range(1, nb)
    )
    edge_vals = ", ".join(f"({k}, {e[k]!r}, {e[k + 1]!r})" for k in range(nb))
    edgepos = ", ".join(f"({i}, {v!r})" for i, v in enumerate(e))
    return f"""
WITH feat AS (
  SELECT value AS x, CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS h
  FROM events WHERE value IS NOT NULL
),
edges(k0, lo, hi) AS (VALUES {edge_vals}),
binned AS (
  SELECT CASE {case} ELSE {nb} END AS k, x, h FROM feat
),
delta AS (
  SELECT e.k0 + 1 AS k,
         COALESCE(AVG((2.0*e.hi + 0.1*b.h*b.h + 0.5*e.hi*b.h)
                    - (2.0*e.lo + 0.1*b.h*b.h + 0.5*e.lo*b.h)), 0.0) AS d,
         COUNT(b.x) AS c
  FROM edges e LEFT JOIN binned b ON b.k = e.k0 + 1
  GROUP BY e.k0
),
unc AS (
  SELECT 0 AS idx, 0.0 AS au, CAST(0 AS BIGINT) AS c
  UNION ALL
  SELECT k AS idx, SUM(d) OVER (ORDER BY k) AS au, CAST(c AS BIGINT) AS c
  FROM delta
),
seg AS (SELECT idx, au, c, LAG(au) OVER (ORDER BY idx) AS au_prev FROM unc),
wm AS (SELECT SUM((au_prev + au) / 2.0 * c) / SUM(c) AS v
       FROM seg WHERE idx >= 1),
edgepos(idx, bin_edge) AS (VALUES {edgepos})
SELECT CAST(u.idx AS BIGINT) AS edge_idx,
       p.bin_edge AS bin_edge,
       ROUND(ROUND(u.au - (SELECT v FROM wm), 9), 6) AS ale,
       u.c AS bin_count
FROM unc u JOIN edgepos p ON p.idx = u.idx
ORDER BY edge_idx
"""


# ------------------------------------------------------------------ 2D ALE

# Literal grids for the oracle-pinned 2D query: x = value (4 bins),
# y = hour-of-day (4 bins). 16 cells, 25 output edge points.
ALE2_XE = [0.0, 50.0, 150.0, 300.0, 600.0]
ALE2_YE = [0.0, 6.0, 12.0, 18.0, 24.0]


def poly2_predict(_payload, X: np.ndarray) -> np.ndarray:
    """Closed-form model with a third feature z that survives in the
    second difference (0.5 + 0.05*z per unit area), so the surface is
    genuinely data-dependent; the SQL oracle spells out the identical
    expression."""
    x, h, z = X[:, 0], X[:, 1], X[:, 2]
    return 2.0 * x + 0.1 * h * h + 0.5 * x * h + 0.05 * x * h * z


def q_ale2d_fixed_grid(sf_dir: str) -> pd.DataFrame:
    """Second-order ALE surface (ale.py:258-322) over the events table:
    (x=value, y=hour, z=user bucket), literal grids, closed-form model.
    Exercises the four-corner batch kernel, sparse cell partials, double
    cumsum + pad + double centering end-to-end vs an exact SQL oracle."""
    import ray.data as rd

    from ..stages.ale import ale_2d

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df["ts"])
        return pd.DataFrame(
            {
                "x": df["value"].astype(float),
                "h": ((us // US_PER_HOUR) % 24).astype(np.float64),
                "z": (df["user_id"].to_numpy(dtype=np.int64) % 8).astype(
                    np.float64
                ),
            }
        )

    feat = ds.map_batches(featurize, batch_format="pandas")
    out = ale_2d(
        feat,
        ray.put(None),
        poly2_predict,
        ["x", "h", "z"],
        "x",
        "h",
        x_edges=np.array(ALE2_XE),
        y_edges=np.array(ALE2_YE),
    )
    out["ale2"] = stable_round6(out["ale2"].astype(float))
    out["x_edge_idx"] = out["x_edge_idx"].astype("int64")
    out["y_edge_idx"] = out["y_edge_idx"].astype("int64")
    return out.sort_values(["y_edge_idx", "x_edge_idx"]).reset_index(drop=True)


def _ale2d_fixed_sql() -> str:
    xe, ye = ALE2_XE, ALE2_YE
    nx, ny = len(xe) - 1, len(ye) - 1
    casex = " ".join(f"WHEN x <= {xe[k]!r} THEN {k}" for k in range(1, nx))
    casey = " ".join(f"WHEN h <= {ye[k]!r} THEN {k}" for k in range(1, ny))
    xcells = ", ".join(f"({k}, {xe[k - 1]!r}, {xe[k]!r})" for k in range(1, nx + 1))
    ycells = ", ".join(f"({k}, {ye[k - 1]!r}, {ye[k]!r})" for k in range(1, ny + 1))
    xpos = ", ".join(f"({i}, {v!r})" for i, v in enumerate(xe))
    ypos = ", ".join(f"({i}, {v!r})" for i, v in enumerate(ye))
    # f(x,h,z) with the feature pinned to the cell corner; only terms
    # containing BOTH x and h survive the second difference but the
    # oracle evaluates the full expression exactly like the kernel does.
    f = "(2.0*{x} + 0.1*{y}*{y} + 0.5*{x}*{y} + 0.05*{x}*{y}*b.z)"
    corner = (
        f.format(x="cx.xhi", y="cy.yhi")
        + " - " + f.format(x="cx.xlo", y="cy.yhi")
        + " - " + f.format(x="cx.xhi", y="cy.ylo")
        + " + " + f.format(x="cx.xlo", y="cy.ylo")
    )
    return f"""
WITH feat AS (
  SELECT value AS x,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS h,
         CAST(user_id % 8 AS DOUBLE) AS z
  FROM events WHERE value IS NOT NULL
),
binned AS (
  SELECT CASE {casex} ELSE {nx} END AS i,
         CASE {casey} ELSE {ny} END AS j, z
  FROM feat
),
xcells(i0, xlo, xhi) AS (VALUES {xcells}),
ycells(j0, ylo, yhi) AS (VALUES {ycells}),
delta AS (
  SELECT cx.i0 AS i, cy.j0 AS j,
         COALESCE(AVG({corner}), 0.0) AS d
  FROM xcells cx CROSS JOIN ycells cy
  LEFT JOIN binned b ON b.i = cx.i0 AND b.j = cy.j0
  GROUP BY cx.i0, cy.j0
),
grid AS (
  SELECT xp.idx AS i, yp.idx AS j
  FROM (SELECT UNNEST(range({nx + 1})) AS idx) xp,
       (SELECT UNNEST(range({ny + 1})) AS idx) yp
),
acc AS (
  SELECT g.i, g.j, COALESCE(SUM(d.d), 0.0) AS au
  FROM grid g LEFT JOIN delta d ON d.i <= g.i AND d.j <= g.j
  GROUP BY g.i, g.j
),
rowm AS (SELECT j, AVG(au) AS rm FROM acc GROUP BY j),
colm AS (SELECT i, AVG(au) AS cm FROM acc GROUP BY i),
gm AS (SELECT AVG(au) AS g FROM acc),
xpos(idx, x_edge) AS (VALUES {xpos}),
ypos(idx, y_edge) AS (VALUES {ypos})
SELECT CAST(a.i AS BIGINT) AS x_edge_idx,
       CAST(a.j AS BIGINT) AS y_edge_idx,
       xp.x_edge, yp.y_edge,
       ROUND(ROUND(a.au - r.rm - c.cm + (SELECT g FROM gm), 9), 6) AS ale2
FROM acc a
JOIN rowm r ON r.j = a.j
JOIN colm c ON c.i = a.i
JOIN xpos xp ON xp.idx = a.i
JOIN ypos yp ON yp.idx = a.j
ORDER BY y_edge_idx, x_edge_idx
"""


ALE_QUERIES = {
    "ale_fixed_grid": q_ale_fixed_grid,
    "ale2d_fixed_grid": q_ale2d_fixed_grid,
    "driver_importance": q_driver_importance,
    "ale_response": q_ale_response,
}

ALE_ORACLE = {
    "ale_fixed_grid": _ale_fixed_sql(),
    "ale2d_fixed_grid": _ale2d_fixed_sql(),
}
