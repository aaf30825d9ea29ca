"""Generic distributed equi-join.

The reference's fact-fact joins are single-process ``pd.merge`` calls
(`/root/reference/src/pumps/player_game.py:184-188,472-475`). The rebuild
exposes ONE library entry point built on the repo's own hash-bucket
cogroup spine: both sides are tagged, hash-partitioned on the join key
with the SAME partitioner (``stages.bucketize.with_bucket``), unioned into
ONE shuffle, and merged per bucket with the vectorized pandas merge. The
partition count is the explicit scale knob: at 100 TB, size
``num_partitions`` so each partition's build side fits a worker's heap.

Why not ``ray.data.Dataset.join``: Ray 2.49's native hash-shuffle join
crashes (KeyError on the key column inside the acero per-partition join)
whenever a hash partition receives ZERO rows from one side — reproduced
with any input whose distinct-key count is below ``num_partitions``.
The cogroup formulation is immune (an empty bucket simply yields no
group) and reuses the battle-tested exchange every other operator rides.

For joins already riding the conv_id spine, prefer the in-bucket cogroup
directly (`state/asof.py`) which reuses the ONE existing shuffle; this
helper is for standalone fact-fact joins on a fresh key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nfl_feature_store_ray.stages.bucketize import BUCKET_COL, with_bucket

_SIDE_COL = "_jside"

_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "outer",
    "semi": "semi",
    "anti": "anti",
}


def equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    left_suffix: str | None = None,
    right_suffix: str = "_r",
    left_schema_hint: dict | None = None,
    right_schema_hint: dict | None = None,
) -> ray.data.Dataset:
    """Distributed hash equi-join of two Datasets.

    ``how`` accepts pandas-style names (inner/left/right/outer/semi/anti).
    Collision handling: colliding non-key columns get ``right_suffix`` on
    the right side (and ``left_suffix`` on the left when given). When the
    key columns share names the output carries ONE key column (pandas
    merge semantics); differently-named keys both survive (outer rows
    null-fill the absent side, so consumers coalesce the two key columns).

    ``*_schema_hint`` ({column -> pandas dtype}, in column order): when
    given, skips the ``Dataset.schema()`` probe for that side. The probe
    partially EXECUTES a lazy upstream pipeline, so in a join CHAIN each
    downstream join re-runs its inputs — a caller that knows its columns
    (it usually projected them) avoids that entirely.
    """
    if how not in _HOW:
        raise ValueError(f"unsupported join type: {how!r} (one of {sorted(_HOW)})")
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = on_t if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    if len(r_t) != len(on_t):
        raise ValueError("right_on arity must match on")

    left_schema = None if left_schema_hint is not None else left.schema()
    right_schema = None if right_schema_hint is not None else right.schema()
    left_cols = list(left_schema_hint) if left_schema_hint is not None else list(left_schema.names)
    right_cols = list(right_schema_hint) if right_schema_hint is not None else list(right_schema.names)
    same_keys = r_t == on_t

    # pre-rename colliding right (and optionally left) NON-KEY columns so
    # the tagged union frame has unique names; same-named key columns stay
    # shared (one output column, both sides write it)
    shared = (set(left_cols) & set(right_cols)) - (set(on_t) if same_keys else set())
    r_rename = {c: c + right_suffix for c in shared if c not in r_t}
    l_rename = {c: c + left_suffix for c in shared if left_suffix and c not in on_t}
    left_out = [l_rename.get(c, c) for c in left_cols]
    right_out = [r_rename.get(c, c) for c in right_cols]
    # union frame columns: left's, then right's not already present
    all_cols = left_out + [c for c in right_out if c not in left_out]

    # schema types are pyarrow DataTypes for Arrow blocks, numpy dtypes for
    # pandas blocks — normalize to pandas dtypes to undo union promotion
    def _dtypes(schema, rename):
        return {
            rename.get(n, n): (t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else t)
            for n, t in zip(schema.names, schema.types)
        }

    def _hint_dtypes(hint, rename):
        return {rename.get(n, n): t for n, t in hint.items()}

    left_dtypes = (_hint_dtypes(left_schema_hint, l_rename)
                   if left_schema_hint is not None else _dtypes(left_schema, l_rename))
    right_dtypes = (_hint_dtypes(right_schema_hint, r_rename)
                    if right_schema_hint is not None else _dtypes(right_schema, r_rename))

    def tag(side: int):
        rename = l_rename if side == 0 else r_rename

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.rename(columns=rename)
            batch = batch.reindex(columns=all_cols)
            batch[_SIDE_COL] = np.int8(side)
            return batch

        return fn

    lkey = [l_rename.get(c, c) for c in on_t]
    rkey = [r_rename.get(c, c) for c in r_t]
    l_tagged = with_bucket(
        left.map_batches(tag(0), batch_format="pandas"), key=lkey, num_buckets=num_partitions
    )
    r_tagged = with_bucket(
        right.map_batches(tag(1), batch_format="pandas"), key=rkey, num_buckets=num_partitions
    )
    both = l_tagged.union(r_tagged)

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        for c, dt in dtypes.items():
            if c in df.columns and df[c].dtype != dt and not df[c].isna().any():
                try:
                    df[c] = df[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        return df

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        is_left = group[_SIDE_COL].to_numpy() == 0
        lf = _restore(group.loc[is_left, left_out].reset_index(drop=True), left_dtypes)
        rf = _restore(group.loc[~is_left, right_out].reset_index(drop=True), right_dtypes)
        # SQL equi-join semantics: NULL keys never match (pandas merge
        # matches NaN to NaN — r03 ADVICE). Null-keyed rows are excluded
        # from the match path and re-appended as dangling rows for the
        # outer variants / kept by anti (NOT EXISTS never finds a match).
        lnull = lf[lkey].isna().any(axis=1).to_numpy()
        rnull = rf[rkey].isna().any(axis=1).to_numpy()
        if how in ("semi", "anti"):
            # vectorized membership: indicator merge against the DEDUPED
            # non-null right keys keeps left multiplicity and stays C-path
            probe = rf.loc[~rnull, rkey].drop_duplicates()
            m = lf.merge(
                probe, left_on=lkey, right_on=rkey, how="left", indicator=True
            )
            matched = (m["_merge"] == "both").to_numpy() & ~lnull
            keep = matched if how == "semi" else ~matched
            return m.loc[keep, left_out].reset_index(drop=True)
        lm, rm = lf.loc[~lnull], rf.loc[~rnull]
        if same_keys:
            core = lm.merge(rm, on=list(on_t), how=how)
        else:
            core = lm.merge(rm, left_on=lkey, right_on=rkey, how=how)
        parts = [core]
        if how in ("left", "outer") and lnull.any():
            parts.append(lf.loc[lnull].reindex(columns=core.columns))
        if how in ("right", "outer") and rnull.any():
            parts.append(rf.loc[rnull].reindex(columns=core.columns))
        return pd.concat(parts, ignore_index=True) if len(parts) > 1 else core

    return both.groupby(BUCKET_COL).map_groups(
        lambda g: merge_bucket(g.drop(columns=[BUCKET_COL])), batch_format="pandas"
    )
