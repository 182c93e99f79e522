"""Retention policies over the cascading tier store (the north rule's
"rollup + downsample + RETENTION engine": raw -> 1m -> 1h -> 1d with
per-tier maximum ages — old raw data expires once its coarser rollups
exist, cf. the continuous-aggregate retention model of Gorilla
(VLDB'15 §4.1, block ageing) and every production TSDB).

No reference counterpart (the reference keeps whole pandas frames);
this is engine infrastructure required by BASELINE.json.

Two enforcement layers, both deterministic against a watermark:

* **Partition expiry (the 100-TB path)** — ``expired_chunk_paths``
  operates purely on the lake manifest (path, source, chunk_lo): a
  chunk file whose ENTIRE span lies beyond the tier's max age is
  dropped by path, no data read, no shuffle. Resumable by
  construction (the manifest is rewritten without the dropped rows).
* **Row-level sweep (the boundary partition)** — ``retention_filter``
  is a pure per-batch predicate over tier rows: keep where
  ``watermark - bucket_ts <= max_age[tier]`` (tiers without a policy
  are kept forever). ``retention_counts`` reports per-tier
  kept/expired row counts plus the kept tiers' exact event coverage
  (integer sum of child counts) — the invariant that expired fine
  rows remain represented in surviving coarser tiers is checkable
  from those sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

US_PER_SEC = 1_000_000


def expired_chunk_paths(
    manifest: pd.DataFrame,
    *,
    max_age_us: int,
    watermark_us: int,
    chunk_seconds: int,
    t0_us: int = 0,
) -> list[str]:
    """Paths of chunk files whose whole span [t0 + chunk_lo, t0 +
    chunk_lo + chunk_seconds) is older than ``max_age_us`` at the
    watermark — droppable without reading any data."""
    lo_us = t0_us + manifest["chunk_lo"].to_numpy(dtype=np.int64) * US_PER_SEC
    hi_us = lo_us + chunk_seconds * US_PER_SEC
    expired = hi_us <= watermark_us - max_age_us
    return manifest.loc[expired, "path"].tolist()


def retention_filter(ds, policy_us: dict[str, int | None], watermark_us: int,
                     *, tier_col: str = "tier", bucket_col: str = "bucket_ts"):
    """Keep tier rows inside their tier's retention window (per-batch
    predicate, no shuffle). ``policy_us[tier] = None`` keeps forever;
    tiers absent from the policy are kept."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        age = watermark_us - pd.to_datetime(df[bucket_col]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        keep_mask = np.ones(len(df), dtype=bool)
        for t, max_age in policy_us.items():
            if max_age is None:
                continue
            keep_mask &= (df[tier_col].to_numpy() != t) | (age <= max_age)
        return df[keep_mask]

    return ds.map_batches(keep, batch_format="pandas", zero_copy_batch=False)


def retention_counts(ds, policy_us: dict[str, int | None], watermark_us: int,
                     *, tier_col: str = "tier", bucket_col: str = "bucket_ts",
                     count_col: str = "count") -> pd.DataFrame:
    """Per-tier (kept, expired, kept_events) under the policy — exact
    integer partials per batch, tiny driver combine."""
    from .exchange import driver_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        age = watermark_us - pd.to_datetime(df[bucket_col]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        rows = []
        for t, g_idx in df.groupby(tier_col, sort=False).groups.items():
            idx = np.asarray(g_idx)
            max_age = policy_us.get(t)
            kept = np.ones(len(idx), dtype=bool) if max_age is None \
                else age[idx] <= max_age
            cnts = df[count_col].to_numpy(dtype=np.int64)[idx]
            rows.append({
                "tier": t,
                "kept": int(kept.sum()),
                "expired": int((~kept).sum()),
                "kept_events": int(cnts[kept].sum()),
            })
        return pd.DataFrame(rows)

    out = driver_combine(
        ds, partial,
        lambda df: df.groupby("tier", as_index=False)[["kept", "expired", "kept_events"]].sum(),
        batch_format="pandas",
    )
    return out.sort_values("tier").reset_index(drop=True)
