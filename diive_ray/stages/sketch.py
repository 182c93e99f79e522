"""Heavy hitters over a 100-TB text/token stream: Misra-Gries sketch
with an exact second pass.

The exchange-based exact word count (one all-to-all on the token key)
is the obvious plan and is what the SQL oracle does — but at corpus
scale the token key space is huge and the full exchange moves one row
per DISTINCT token per block. The sketch path never shuffles the token
space at all:

1. **Per-batch Misra-Gries summary** (bounded ``capacity`` entries):
   vectorized token counts for the batch, then the classic decrement —
   subtract the smallest delta that brings the summary under capacity
   and drop non-positive entries. Each batch emits <= capacity
   (token, cnt) rows.
2. **Hierarchical merge**: the summary rows are a Dataset; repartition
   to a few blocks and MG-merge each block (sum counts per token, then
   decrement to capacity), then one driver-side final merge of the
   per-block summaries. MG summaries are mergeable (Agarwal et al.,
   "Mergeable Summaries", PODS'12): the merged summary keeps the
   guarantee that any token with true count > N/(capacity+1) survives,
   so with capacity >> k * (N / count_of_kth) the true top-k is a
   subset of the candidates.
3. **Exact verify pass**: broadcast the candidate set (<= capacity
   tokens), count ONLY candidates per batch (vectorized isin), sum the
   per-batch partials driver-side (bounded by capacity rows), exact
   top-k with a deterministic (count DESC, token ASC) tie-break.

The final counts are EXACT (pass 3 recounts), which is why the op can
carry a plain SQL oracle despite using a sketch: the sketch only
bounds which tokens get recounted.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import driver_combine


def tokenize_batch(texts: pd.Series) -> pd.Series:
    """Lowercase whitespace tokens, exploded (the oracle's
    string_split_regex(lower(text), '\\s+') minus empties)."""
    toks = texts.astype(str).str.lower().str.split()
    return toks.explode().dropna()


def mg_decrement(tokens: np.ndarray, counts: np.ndarray, capacity: int):
    """Classic Misra-Gries shrink: if more than ``capacity`` entries,
    subtract the (capacity+1)-th largest count from all and drop
    non-positive entries. Returns (tokens, counts) sorted by token."""
    if len(tokens) <= capacity:
        order = np.argsort(tokens, kind="stable")
        return tokens[order], counts[order]
    kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    keep = counts > kth
    tokens, counts = tokens[keep], counts[keep] - kth
    order = np.argsort(tokens, kind="stable")
    return tokens[order], counts[order]


def _mg_of_frame(tok: pd.Series, capacity: int) -> pd.DataFrame:
    vc = tok.value_counts()
    t, c = mg_decrement(
        vc.index.to_numpy(dtype=object), vc.to_numpy(dtype=np.int64), capacity
    )
    return pd.DataFrame({"token": t, "cnt": c})


def _mg_merge_frame(df: pd.DataFrame, capacity: int) -> pd.DataFrame:
    g = df.groupby("token", sort=False, as_index=False)["cnt"].sum()
    t, c = mg_decrement(
        g["token"].to_numpy(dtype=object), g["cnt"].to_numpy(dtype=np.int64), capacity
    )
    return pd.DataFrame({"token": t, "cnt": c})


def heavy_hitters(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    merge_blocks: int = 4,
    tokenizer: Callable[[pd.Series], pd.Series] = tokenize_batch,
) -> pd.DataFrame:
    """Exact top-k tokens via MG candidates + exact recount. Returns a
    k-row frame (token, cnt) ordered by (cnt DESC, token ASC). Exact
    whenever every true top-k token has count > N/(capacity+1) — the
    caller sizes capacity for its corpus shape (Zipfian text needs only
    capacity >> k)."""

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        return _mg_of_frame(tokenizer(df[text_col]), capacity)

    summaries = ds.map_batches(pass1, batch_format="pandas")
    merged = summaries.repartition(merge_blocks).map_batches(
        lambda df: _mg_merge_frame(df, capacity), batch_format="pandas"
    )
    final = _mg_merge_frame(merged.to_pandas(), capacity)
    candidates = set(final["token"].tolist())

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        tok = tokenizer(df[text_col])
        tok = tok[tok.isin(candidates)]
        vc = tok.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object), "cnt": vc.to_numpy(np.int64)}
        )

    exact = driver_combine(
        ds,
        pass2,
        lambda df: df.groupby("token", as_index=False)["cnt"].sum(),
        batch_format="pandas",
    )
    exact = exact.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    exact["cnt"] = exact["cnt"].astype(np.int64)
    return exact.reset_index(drop=True)
