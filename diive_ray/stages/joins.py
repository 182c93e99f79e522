"""Distributed ordered joins: ASOF join and sessionization.

Neither exists in Ray Data's Dataset API; both are classic time-series
operators (the reference's windowed lookups — e.g. the MDS gap-fill's
"closest earlier record" searches, diive gapfilling/similarity.py — are
point-in-time joins in disguise). Both are built on the engine's
exchange layer (stages/exchange.py): ONE hash exchange on the join key
co-locates every row of a key in a single block, then the per-block
work is fully vectorized pandas (`merge_asof` / diff+cumsum).

Scale notes (100 TB):
* one all-to-all on the key per call — no driver materialization, no
  per-row Python;
* a hot key's entire history lands in one block: same partitioning
  contract as the rest of the engine (block_map). For monotone
  time-partitioned layouts, pre-bucketing by (key, coarse time bucket)
  with a one-bucket halo on the right side bounds block size; callers
  with that layout should bucket upstream and pass the bucketed key.
* ASOF determinism: ties on (key, on) in the RIGHT side make the
  matched row engine-dependent — callers must deduplicate the right
  side (aggregates are naturally unique per (key, bucket)).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray
import pyarrow as pa
import ray.data as rd

from ..util import ts_to_us
from .exchange import block_map


def _append_missing(t: pa.Table, fields: list[pa.Field]) -> pa.Table:
    for f in fields:
        t = t.append_column(f.name, pa.nulls(len(t), f.type))
    return t


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow.Schema. Datasets whose last stage was
    a pandas map_batches report a PandasBlockSchema (numpy dtypes);
    convert field-by-field (object -> string: the engine's only object
    columns are strings)."""
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    fields = []
    for n, t in zip(s.names, s.types):
        if t == np.dtype("O"):
            fields.append(pa.field(n, pa.string()))
        else:
            fields.append(pa.field(n, pa.from_numpy_dtype(t)))
    return pa.schema(fields)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    on: str,
    direction: str = "backward",
    tolerance: "pd.Timedelta | None" = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Point-in-time join: for each left row, attach the most recent
    right row of the same ``key`` with ``right.on <= left.on``
    (direction="backward"; "forward" symmetric), optionally within
    ``tolerance``.

    ``right`` must carry columns ``[key, on] + value_cols`` where the
    value columns are disjoint from left's; the output is left's schema
    plus the value columns (null where no match). Right must be unique
    per (key, on) for deterministic results.

    Plan: tag side -> align schemas (typed nulls) -> union -> ONE hash
    exchange on ``key`` -> per-block sort + ``pd.merge_asof(by=key)``.
    """
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_cols = list(lschema.names)
    value_cols = [c for c in rschema.names if c not in (key, on)]
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(f"right value columns clash with left schema: {sorted(clash)}")
    if key not in left_cols or on not in left_cols:
        raise ValueError(f"left must carry key={key!r} and on={on!r}")
    order = left_cols + value_cols

    miss_left = [rschema.field(c) for c in value_cols]
    miss_right = [lschema.field(c) for c in left_cols if c not in (key, on) and c not in value_cols]

    def tag(side: int, missing: list[pa.Field]):
        def fn(t: pa.Table) -> pa.Table:
            t = _append_missing(t, missing)
            t = t.append_column("_side", pa.array(np.full(len(t), side, dtype=np.uint8)))
            return t.select(order + ["_side"])

        return fn

    unioned = left.map_batches(tag(0, miss_left), batch_format="pyarrow").union(
        right.map_batches(tag(1, miss_right), batch_format="pyarrow")
    )

    # left int/bool columns pass through the union as typed nulls on
    # right-side rows, so the block's pandas conversion promotes them to
    # float/object; restore the native dtype where no nulls remain
    # (matching what a direct to_pandas of the left would have yielded).
    restore = {}
    for f in lschema:
        if pa.types.is_integer(f.type):
            restore[f.name] = np.dtype(f.type.to_pandas_dtype())
        elif pa.types.is_boolean(f.type):
            restore[f.name] = np.dtype(bool)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0].drop(columns=value_cols + ["_side"])
        r = df[df["_side"] == 1][[key, on] + value_cols]
        l = l.sort_values(on, kind="mergesort", ignore_index=True)
        r = r.sort_values(on, kind="mergesort", ignore_index=True)
        for c, dt in restore.items():
            if not l[c].isna().any():
                l[c] = l[c].astype(dt)
        if l.empty:
            return l.assign(**{c: r[c].iloc[0:0].reindex(range(0)) for c in value_cols})
        return pd.merge_asof(
            l, r, on=on, by=key, direction=direction, tolerance=tolerance
        )

    return block_map(
        unioned,
        [key],
        combine,
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )


def sessionize_frame(
    df: pd.DataFrame, *, key: str, ts: str, timeout_us: int
) -> pd.DataFrame:
    """Vectorized per-block session labeling (all rows of a key must be
    in this frame — guaranteed downstream of the keyed exchange).
    Appends int64 ``session_id`` (1-based per key): a new session starts
    whenever the gap to the key's previous record exceeds timeout_us.
    Ties on (key, ts) share a session regardless of order (gap 0)."""
    if df.empty:
        return df.assign(session_id=np.array([], dtype=np.int64))
    df = df.sort_values([key, ts], kind="mergesort", ignore_index=True)
    tsv = ts_to_us(df[ts])
    new_key = df[key].ne(df[key].shift(1)).to_numpy()
    gap = np.diff(tsv, prepend=tsv[:1])
    new_sess = new_key | (gap > timeout_us)
    sid = np.cumsum(new_sess)
    first_idx = np.flatnonzero(new_key)
    counts = np.diff(np.append(first_idx, len(df)))
    base = np.repeat(sid[first_idx], counts)
    return df.assign(session_id=(sid - base + 1).astype(np.int64))


def sessionize(
    ds: rd.Dataset,
    *,
    key: str,
    ts: str,
    timeout_us: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Streaming-log sessionization: ONE hash exchange on ``key``, then
    per-block vectorized gap/cumsum labeling (sessions cannot span
    blocks because the exchange co-locates each key)."""
    return block_map(
        ds,
        [key],
        lambda df: sessionize_frame(df, key=key, ts=ts, timeout_us=timeout_us),
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )


def session_stats(
    ds: rd.Dataset,
    *,
    key: str,
    ts: str,
    timeout_us: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-session aggregate (start/end/n_events/duration) in the SAME
    exchange as the labeling — the session rows are already co-located,
    so the rollup is a per-block pandas groupby, no second shuffle."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lab = sessionize_frame(df, key=key, ts=ts, timeout_us=timeout_us)
        if lab.empty:
            return pd.DataFrame(
                {
                    key: lab[key] if key in lab else pd.Series([], dtype="int64"),
                    "session_id": pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="datetime64[us]"),
                    "session_end": pd.Series([], dtype="datetime64[us]"),
                    "n_events": pd.Series([], dtype="int64"),
                    "duration_s": pd.Series([], dtype="int64"),
                }
            )
        g = lab.groupby([key, "session_id"], sort=False)[ts]
        out = g.agg(session_start="min", session_end="max", n_events="size").reset_index()
        dur = ts_to_us(out["session_end"]) - ts_to_us(out["session_start"])
        out["duration_s"] = (dur // 1_000_000).astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        out["session_start"] = pd.to_datetime(out["session_start"]).astype("datetime64[us]")
        out["session_end"] = pd.to_datetime(out["session_end"]).astype("datetime64[us]")
        return out

    return block_map(
        ds,
        [key],
        fn,
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )


# ------------------------------------------------------------- range join


def _build_interval_index(
    intervals: pd.DataFrame, key: str, start_col: str, end_col: str
) -> dict:
    """Per-key interval arrays (start_us, end_us, positional row ids),
    sorted by start, plus a flag for the overlap-free fast path."""
    idx: dict = {}
    iv = intervals.reset_index(drop=True)
    for k, grp in iv.groupby(key, sort=False):
        order = np.argsort(ts_to_us(grp[start_col]), kind="stable")
        starts = ts_to_us(grp[start_col])[order]
        ends = ts_to_us(grp[end_col])[order]
        rows = grp.index.to_numpy()[order]
        disjoint = bool(np.all(starts[1:] >= ends[:-1])) if len(starts) > 1 else True
        idx[k] = (starts, ends, rows, disjoint)
    return idx


def range_join(
    ds: rd.Dataset,
    intervals: pd.DataFrame,
    *,
    key: str,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    closed: str = "left",
) -> rd.Dataset:
    """Broadcast interval join: attach matching interval rows to each
    point row with the same ``key`` and ``start <= ts < end``
    (closed="left"; closed="both" makes the end inclusive). Inner join:
    non-matching points are dropped; overlapping intervals fan out one
    output row per match.

    This is the small-side pattern of the reference's event-window
    lookups (Event/event_to_flag, diive core dfun frames event ranges):
    the interval table is broadcast ONCE via ``ray.put`` and every batch
    matches vectorized against per-key sorted arrays — np.searchsorted
    when a key's intervals are disjoint (one candidate per point), a
    bounded per-interval mask sweep otherwise. No shuffle at any scale;
    the contract is that ``intervals`` is driver-small (thousands of
    rows), which is the only regime where a range join should NOT be an
    exchange."""
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    value_cols = [c for c in intervals.columns if c not in (key, start_col, end_col)]
    index_ref = ray.put(_build_interval_index(intervals, key, start_col, end_col))
    payload_ref = ray.put(intervals[value_cols].reset_index(drop=True))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        index = ray.get(index_ref)
        payload = ray.get(payload_ref)
        pieces = []
        for k, grp in df.groupby(key, sort=False):
            ent = index.get(k)
            if ent is None:
                continue
            starts, ends, rows, disjoint = ent
            tsv = ts_to_us(grp[ts_col])
            if disjoint:
                pos = np.searchsorted(starts, tsv, side="right") - 1
                ok = pos >= 0
                inside = np.zeros(len(tsv), dtype=bool)
                if closed == "left":
                    inside[ok] = tsv[ok] < ends[pos[ok]]
                else:
                    inside[ok] = tsv[ok] <= ends[pos[ok]]
                if not inside.any():
                    continue
                left_part = grp.iloc[np.flatnonzero(inside)].reset_index(drop=True)
                right_part = payload.iloc[rows[pos[inside]]].reset_index(drop=True)
                pieces.append(pd.concat([left_part, right_part], axis=1))
            else:
                for i in range(len(starts)):
                    if closed == "left":
                        m = (tsv >= starts[i]) & (tsv < ends[i])
                    else:
                        m = (tsv >= starts[i]) & (tsv <= ends[i])
                    if not m.any():
                        continue
                    left_part = grp.iloc[np.flatnonzero(m)].reset_index(drop=True)
                    right_part = (
                        payload.iloc[np.full(int(m.sum()), rows[i])]
                        .reset_index(drop=True)
                    )
                    pieces.append(pd.concat([left_part, right_part], axis=1))
        if not pieces:
            out = df.iloc[0:0].copy()
            for c in value_cols:
                out[c] = pd.Series([], dtype=intervals[c].dtype)
            return out
        return pd.concat(pieces, ignore_index=True)

    return ds.map_batches(match, batch_format="pandas")


def funnel_counts(
    ds: rd.Dataset,
    *,
    steps: "list[str]",
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    window_us: "int | None" = None,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Ordered conversion funnel: how many distinct ``key``s reach each
    step, where step k counts only events STRICTLY after that key's
    step-(k-1) completion time — and, with ``window_us``, no later than
    ``window_us`` after the step-1 time (the classic web-analytics
    funnel; no reference counterpart, events-table extension in the
    spirit of sessionize/retention).

    Completion times are per-key minima, so the result is deterministic
    under any row order. Distribution: rows are filtered to the step
    events and projected to (key, event_col, ts) at the read, ONE
    exchange on key, then per-block vectorized per-step masking +
    groupby-min (k passes, no per-user Python); each block emits k
    partial counts (keys are block-disjoint, so a driver sum over
    ≤ k x #blocks tiny rows finishes). Output: (step, event_type,
    n_users) — one row per step."""
    from .exchange import block_map

    steps = list(steps)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[event_col].isin(steps)]
        return df[[key, event_col, ts]]

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "step": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
        })
        if df.empty:
            return out_empty
        us = df[ts].astype("datetime64[us]").astype("int64").to_numpy()
        # rebase to the block min: reindex() below goes through float64
        # (NaN for keys missing a prior step), and absolute epoch-us
        # (~1.7e18) exceeds float64's exact-integer range — deltas
        # within a block (days, ~1e12) stay exact
        us = us - us.min()
        df = pd.DataFrame({key: df[key].to_numpy(), "ev": df[event_col].to_numpy(), "us": us})
        cur = df.loc[df["ev"] == steps[0]].groupby(key)["us"].min()
        t1 = cur.copy()
        rows = [(1, len(cur))]
        for i, step in enumerate(steps[1:], start=2):
            if cur.empty:
                rows.append((i, 0))
                continue
            sub = df.loc[df["ev"] == step].copy()
            prev = cur.reindex(sub[key]).to_numpy()
            ok = np.isfinite(prev) & (sub["us"].to_numpy() > prev)
            if window_us is not None:
                lim = (t1 + window_us).reindex(sub[key]).to_numpy()
                ok &= sub["us"].to_numpy() <= lim
            sub = sub.loc[ok]
            cur = sub.groupby(key)["us"].min()
            rows.append((i, len(cur)))
        return pd.DataFrame({
            "step": np.array([r[0] for r in rows], dtype=np.int64),
            "n_users": np.array([r[1] for r in rows], dtype=np.int64),
        })

    partials = block_map(
        ds.map_batches(pre, batch_format="pandas"),
        [key], per_block, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    ).to_pandas()
    out = partials.groupby("step", as_index=False)["n_users"].sum()
    out["event_type"] = [steps[s - 1] for s in out["step"]]
    return out[["step", "event_type", "n_users"]].sort_values("step").reset_index(drop=True)


def event_transitions(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    order_col: "str | None" = None,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """First-order transition counts (prev_event -> next_event) over
    each key's time-ordered event sequence — the Markov path-analysis
    primitive behind "next action" product analytics. Deterministic
    under timestamp ties via ``order_col`` as the tie-break.

    Distribution: project (key, event, ts[, order]) at the read, ONE
    exchange on key, per-block vectorized sort + shift with key-boundary
    masking, per-block pair counts (bounded by #event-types²), driver
    sum. Output: (prev_event, next_event, n, p) with p = n / sum(n)
    per prev_event, rounded to 6 dp."""
    from ..util import round6
    from .exchange import block_map

    cols = [key, event_col, ts] + ([order_col] if order_col else [])

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "prev_event": pd.Series([], dtype=object),
                "next_event": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            })
        sort_cols = [key, ts] + ([order_col] if order_col else [])
        df = df.sort_values(sort_cols, kind="stable")
        k = df[key].to_numpy()
        ev = df[event_col].to_numpy()
        same = k[1:] == k[:-1]
        pairs = pd.DataFrame({"prev_event": ev[:-1][same], "next_event": ev[1:][same]})
        out = pairs.groupby(["prev_event", "next_event"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    partials = block_map(
        ds.map_batches(lambda d: d[cols], batch_format="pandas"),
        [key], per_block, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    ).to_pandas()
    out = partials.groupby(["prev_event", "next_event"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    tot = out.groupby("prev_event")["n"].transform("sum")
    out["p"] = round6(out["n"] / tot)
    return out.sort_values(["prev_event", "next_event"]).reset_index(drop=True)


# ----------------------------------------------------------- equi-join


def _restore_int_dtypes(df: pd.DataFrame, schema: pa.Schema) -> pd.DataFrame:
    """Undo the float/object promotion the union's typed nulls caused on
    the OTHER side's rows: restore int/bool dtypes where the subset holds
    no nulls (matching a direct to_pandas of the original side)."""
    for f in schema:
        if f.name not in df.columns:
            continue
        if pa.types.is_integer(f.type) and not df[f.name].isna().any():
            df[f.name] = df[f.name].astype(np.dtype(f.type.to_pandas_dtype()))
        elif pa.types.is_boolean(f.type) and not df[f.name].isna().any():
            df[f.name] = df[f.name].astype(bool)
    return df


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: "str | Iterable[str]",
    how: str = "inner",
    rsuffix: str = "_r",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed equi-join: both sides hash-partitioned on the join
    key in ONE shuffle (the textbook exchange hash join — no counterpart
    in the reference, which is single-frame pandas throughout; this is
    the engine's relational join primitive).

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti``. Semi/anti
    return left's schema unchanged (existence filters). Null join keys
    never match (SQL semantics — pandas' NaN==NaN merge behavior is
    masked out explicitly); in a LEFT join, null-key left rows are kept
    with null right values.

    Right payload columns whose names clash with left's are renamed
    with ``rsuffix``. Key columns must share names on both sides
    (rename the right side upstream when they differ — zero-cost on
    Arrow metadata).

    Plan: tag side -> align schemas with typed nulls -> ``union`` ->
    ONE keyed exchange on ``on`` -> per-block pandas merge. At scale
    each side moves exactly once; a hot key concentrates in one block
    (pre-aggregate, salt, or use ``broadcast_join`` when one side is
    bounded)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_cols = list(lschema.names)
    for k in keys:
        if k not in left_cols or k not in rschema.names:
            raise ValueError(f"join key {k!r} must exist on both sides")

    rename = {
        n: n + rsuffix
        for n in rschema.names
        if n in left_cols and n not in keys
    }
    if any(v in left_cols for v in rename.values()):
        raise ValueError(f"rsuffix={rsuffix!r} still clashes with left schema")

    def retype(t: pa.Table) -> pa.Table:
        # cast right key columns to left's key types so the hash and the
        # merge see one type; rename clashing payload columns
        cols, names = [], []
        for n in t.schema.names:
            col = t.column(n)
            if n in keys:
                want = lschema.field(n).type
                if col.type != want:
                    col = col.cast(want)
                names.append(n)
            else:
                names.append(rename.get(n, n))
            cols.append(col)
        return pa.table(dict(zip(names, cols)))

    right = right.map_batches(retype, batch_format="pyarrow", zero_copy_batch=True)
    rschema2 = pa.schema(
        [pa.field(rename.get(f.name, f.name),
                  lschema.field(f.name).type if f.name in keys else f.type)
         for f in rschema]
    )
    value_cols = [c for c in rschema2.names if c not in keys]
    order = left_cols + value_cols

    miss_left = [rschema2.field(c) for c in value_cols]
    miss_right = [lschema.field(c) for c in left_cols if c not in keys]

    def tag(side: int, missing: list):
        def fn(t: pa.Table) -> pa.Table:
            t = _append_missing(t, missing)
            t = t.append_column("_side", pa.array(np.full(len(t), side, dtype=np.uint8)))
            return t.select(order + ["_side"])

        return fn

    unioned = left.map_batches(tag(0, miss_left), batch_format="pyarrow").union(
        right.map_batches(tag(1, miss_right), batch_format="pyarrow")
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0].drop(columns=value_cols + ["_side"])
        l = _restore_int_dtypes(l.reset_index(drop=True), lschema)
        r = df[df["_side"] == 1][keys + value_cols]
        r = _restore_int_dtypes(r.reset_index(drop=True), rschema2)
        r = r.dropna(subset=keys)
        lkey_ok = ~l[keys].isna().any(axis=1)
        if how == "inner":
            return l[lkey_ok].merge(r, on=keys, how="inner")
        if how == "left":
            matched = l[lkey_ok].merge(r, on=keys, how="left")
            skipped = l[~lkey_ok]
            if len(skipped):
                skipped = skipped.reindex(columns=matched.columns)
                matched = pd.concat([matched, skipped], ignore_index=True)
            return matched
        rk = r[keys].drop_duplicates()
        if how == "semi":
            return l[lkey_ok].merge(rk, on=keys, how="inner")
        # anti: null-key left rows never match -> always kept
        m = l[lkey_ok].merge(rk.assign(__m=1), on=keys, how="left")
        out = m[m["__m"].isna()].drop(columns="__m")
        skipped = l[~lkey_ok]
        if len(skipped):
            out = pd.concat([out, skipped], ignore_index=True)
        return out

    return block_map(
        unioned,
        keys,
        combine,
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    *,
    on: "str | Iterable[str]",
    how: str = "inner",
) -> rd.Dataset:
    """Map-side equi-join for a BOUNDED small side: ``ray.put`` the
    small table ONCE, per-batch pandas merge inside ``map_batches`` —
    zero shuffle, the big side never moves, and the small side is read
    from the object store by every task rather than re-shipped per
    batch. ``how``: ``inner`` | ``left``. Null keys never match; the
    caller pre-renames clashing small-side columns."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (broadcast side must be right)")
    small = small.dropna(subset=keys)
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        sm = _ray.get(ref)
        ok = ~df[keys].isna().any(axis=1)
        out = df[ok].merge(sm, on=keys, how=how)
        if how == "left" and (~ok).any():
            out = pd.concat(
                [out, df[~ok].reindex(columns=out.columns)], ignore_index=True
            )
        return out

    return ds.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------- cohort retention


def retention_cohorts(
    ds: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "D",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Cohort retention matrix (classic product-analytics operator, no
    reference counterpart): cohort = the calendar period of a user's
    FIRST event; a cell (cohort, offset) counts distinct users of that
    cohort active ``offset`` periods later; retention = cell count /
    cohort size, where cohort size == the offset-0 cell (every user is
    active in their own first period by construction).

    Plan: ONE exchange on ``user_col`` — each block then holds its
    users' complete history, so the per-user first period and distinct
    active periods are globally exact in-block; blocks emit
    (cohort, offset, partial count) rows bounded by the calendar, and
    the driver combine sums them. ``period``: 'D' (midnight floor) or
    'W' (ISO-Monday floor)."""
    from .exchange import block_map

    if period not in ("D", "W"):
        raise ValueError("period must be 'D' or 'W'")
    step_days = 1 if period == "D" else 7

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "cohort": pd.Series([], dtype="datetime64[us]"),
                "week_offset" if period == "W" else "day_offset":
                    pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            })
        ts = pd.to_datetime(df[ts_col])
        p = ts.dt.normalize()
        if period == "W":
            p = p - pd.to_timedelta(ts.dt.dayofweek, unit="D")
        sub = pd.DataFrame({"u": df[user_col].to_numpy(), "p": p.to_numpy()})
        sub["cohort"] = sub.groupby("u", sort=False)["p"].transform("min")
        uniq = sub.drop_duplicates(["u", "p"])
        off = ((uniq["p"] - uniq["cohort"]).dt.days // step_days).astype(np.int64)
        name = "week_offset" if period == "W" else "day_offset"
        out = pd.DataFrame({"cohort": uniq["cohort"].to_numpy(), name: off.to_numpy()})
        out = out.groupby(["cohort", name], as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    name = "week_offset" if period == "W" else "day_offset"
    partials = block_map(
        ds.map_batches(lambda d: d[[user_col, ts_col]], batch_format="pandas"),
        [user_col], per_block, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    ).to_pandas()
    act = partials.groupby(["cohort", name], as_index=False)["n"].sum()
    act["n"] = act["n"].astype("int64")
    base = act[act[name] == 0][["cohort", "n"]].rename(columns={"n": "cohort_size"})
    out = act.merge(base, on="cohort", how="left")
    out["retention"] = out["n"] / out["cohort_size"]
    out = out.rename(columns={"n": "n_active"})
    out["cohort_size"] = out["cohort_size"].astype("int64")
    return out.sort_values(["cohort", name]).reset_index(drop=True)
