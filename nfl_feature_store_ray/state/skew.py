"""Explicit skew handling for hot keys (north rule: "explicit skew salting
for hot conversations").

Two mechanisms, matched to the two operator shapes:

1. **Aggregates** (A-class): already skew-proof by construction — every
   aggregation pipeline here pre-combines per batch inside ``map_batches``
   (partial sums/counts), so a hot key contributes ONE row per batch to
   the shuffle regardless of its raw row count.

2. **Prefix-sequential window state** (W-class): a conversation cannot be
   split across tasks (windows are prefix-dependent), so the unit of skew
   is the whole conversation. ``detect_heavy_keys`` finds conversations
   whose row count exceeds a threshold via the same partial-count pattern
   (one small shuffle), and ``window_features(heavy_keys=...)`` gives each
   hot conversation a DEDICATED bucket past the hash range — the hot key
   no longer straggles every other conversation hashed into its bucket,
   and the scheduler can start its bucket first. A conversation larger
   than one worker's heap would need two-pass prefix-aggregate chaining
   (carry-in state handoff between sub-ranges); documented future work —
   at 10^12 turns the heap bound is ~10^8 turns per conversation.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from nfl_feature_store_ray.stages.bucketize import map_conv_buckets


def detect_heavy_keys(
    ds: ray.data.Dataset,
    key: str = "conv_id",
    min_rows: int = 10_000,
    top: int = 64,
) -> dict[str, int]:
    """Exact per-key row counts via partial-count combine; returns the up
    to ``top`` keys with >= min_rows rows, mapped to dense salt indices."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, as_index=False).size().rename(columns={"size": "n"})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(key, as_index=False)["n"].sum()
        return g[g["n"] >= min_rows]

    partials = ds.map_batches(partial, batch_format="pandas")
    heavy = (
        map_conv_buckets(partials, final, key=key, sort_cols=[key], num_buckets=16)
        .to_pandas()
        .sort_values("n", ascending=False)
        .head(top)
    )
    return {k: i for i, k in enumerate(heavy[key])}
