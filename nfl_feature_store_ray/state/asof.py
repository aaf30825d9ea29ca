"""Distributed sorted-merge as-of join (the north rule's core operator).

Reference analogue: J7/W8 — future games are backfilled with each team's
LATEST feature row (`groupby('team').nth(-1)` + left-merge,
`/root/reference/src/pipelines/events/event_regular_season_game.py:46-58`).
The rebuild generalizes that "latest value" lookup to a true as-of join:
each left row at time t matches the most recent right row with
t' < t (strict by default — shift semantics, zero temporal leakage).

Execution shape: both sides are hash-bucketed on the key (same
deterministic hash as the window spine, so one partitioning key is reused
across stages); sides are schema-aligned, tagged, and unioned so ONE
shuffle co-locates them; within each bucket a single vectorized
``pandas.merge_asof(by=key)`` performs the sorted merge. No broadcast, no
global sort; at 100 TB each bucket streams independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nfl_feature_store_ray.schemas import DEFAULT_NUM_BUCKETS
from nfl_feature_store_ray.stages.bucketize import BUCKET_COL, with_bucket

_SIDE_COL = "_asof_side"


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "conv_id",
    on: str = "ts",
    allow_exact_matches: bool = False,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance=None,
) -> ray.data.Dataset:
    """Sorted-merge as-of join; ``direction`` picks the match side.

    ``backward`` (default): left row at t gets the latest right row with
    t' < t (strict — the leakage-free shift semantics the reference's J7
    "latest value" lookup implies). ``forward``: the EARLIEST right row
    with t' >= t (inclusive when ``allow_exact_matches``) — the scheduling
    complement ("next checkpoint after this turn"); forward matches read
    the future by construction, so it is never used for feature
    backfill, only for label/annotation attachment. ``nearest`` picks the
    closer of the two directions per left row with the equal-distance tie
    PINNED to backward (pandas leaves it unspecified) — both scans run in
    the same bucket task, so it still costs one shuffle.

    ``tolerance`` (a ``pd.Timedelta`` when ``on`` is a timestamp) bounds
    the match distance: a left row whose closest right row is farther than
    the tolerance gets nulls — the "stale feature vectors don't backfill"
    guard rail.

    Right-side value columns that collide with left columns get ``suffix``.
    Integer value columns may come back as float64 (null-fill promotion on
    unmatched rows) — documented, deterministic.
    """
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    shared_val_cols = (set(left_cols) & set(right_cols)) - {key, on}
    rename_map = {c: c + suffix for c in shared_val_cols}
    right_out = [rename_map.get(c, c) for c in right_cols if c not in (key, on)]
    all_cols = left_cols + right_out  # key/on come from the left list

    # schema types are pyarrow DataTypes for Arrow blocks, numpy dtypes for
    # pandas blocks — normalize both to pandas dtypes
    left_dtypes = {
        n: (t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else t)
        for n, t in zip(left_schema.names, left_schema.types)
    }

    def tag(side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if side == 1:
                batch = batch.rename(columns=rename_map)
            batch = batch.reindex(columns=all_cols)  # align schemas for union
            batch[_SIDE_COL] = np.int8(side)
            return batch

        return fn

    l_tagged = with_bucket(left.map_batches(tag(0), batch_format="pandas"), key, num_buckets)
    r_tagged = with_bucket(right.map_batches(tag(1), batch_format="pandas"), key, num_buckets)
    both = l_tagged.union(r_tagged)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        is_left = group[_SIDE_COL].to_numpy() == 0
        lf = group.loc[is_left, left_cols].reset_index(drop=True)
        rf = group.loc[~is_left, [key, on] + right_out].reset_index(drop=True)
        # undo union null-fill dtype promotion on the left side
        for c, dt in left_dtypes.items():
            if lf[c].dtype != dt and not lf[c].isna().any():
                try:
                    lf[c] = lf[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        lf = lf.sort_values([on, key], kind="mergesort")
        rf = rf.sort_values([on, key], kind="mergesort")
        if direction == "nearest":
            # pandas' own direction='nearest' leaves the equal-distance
            # tie unspecified; pin it explicitly (tie -> backward) so the
            # result is engine-independent and SQL-expressible as two ASOF
            # joins + a distance CASE. Same ONE shuffle — both scans run
            # inside this bucket task.
            rf2 = rf.assign(_r_on=rf[on])
            bb = pd.merge_asof(lf, rf2, on=on, by=key, direction="backward",
                               allow_exact_matches=allow_exact_matches,
                               tolerance=tolerance)
            ff = pd.merge_asof(lf, rf2, on=on, by=key, direction="forward",
                               allow_exact_matches=allow_exact_matches,
                               tolerance=tolerance)
            lts = lf[on].reset_index(drop=True)
            use_b = bb["_r_on"].notna() & (
                ff["_r_on"].isna()
                | ((lts - bb["_r_on"]) <= (ff["_r_on"] - lts))
            )
            out = bb.drop(columns=["_r_on"])
            for c in right_out:
                out[c] = bb[c].where(use_b, ff[c])
            return out
        return pd.merge_asof(
            lf,
            rf,
            on=on,
            by=key,
            allow_exact_matches=allow_exact_matches,
            direction=direction,
            tolerance=tolerance,
        )

    return both.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pandas")
