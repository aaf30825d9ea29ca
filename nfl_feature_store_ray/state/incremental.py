"""Incremental append: process ONLY newly appended turns, seeded by
persisted per-conversation streaming state.

This is the true feature-store upsert the reference approximates with
daily whole-season recomputes (`feature_store_runner.py:39-55`) and that
partition-level resume (state.manifest) only approximates at partition
granularity (any change rewrites the whole partition). Here each
partition's per-conversation operator state (tails + O(1) registers +
watermarks, `state.streaming._ConvState`) is CHECKPOINTED next to the
layout; the next run restores it, skips every already-processed turn by
per-conversation processed-count, streams just the delta through the
same `StreamingWindowActor` logic, and atomically re-checkpoints.

Cost model at scale: a run touches every partition file but processes
O(appended rows) compute; state files are O(active conversations in the
partition) and are read/written once per partition task. Equality with
the batch engine at every append split is pinned by
tests/test_incremental.py and the driver gate `w_incremental_append`
(phase-1 features ∪ phase-2 features == full-batch == DuckDB SQL).
"""

from __future__ import annotations

import os
import pickle

import pandas as pd
import ray.data

from nfl_feature_store_ray.pipelines.partitioned import partition_files


def _state_path(state_dir: str, part_basename: str) -> str:
    return os.path.join(state_dir, part_basename.replace(".parquet", ".state.pkl"))


def window_features_incremental(
    part_dir: str,
    state_dir: str,
    metrics: tuple[str, ...] = ("value",),
    phases: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """One incremental pass over a SORTED partitioned layout: per
    partition task, restore that partition's conversation state, emit
    features for rows BEYOND each conversation's processed count, and
    atomically persist the updated state. Returns only the NEW rows'
    features (empty on a no-op run)."""
    from nfl_feature_store_ray.stages.derive import derive_turn_columns
    from nfl_feature_store_ray.state.streaming import StreamingWindowActor

    os.makedirs(state_dir, exist_ok=True)
    paths = partition_files(part_dir)
    if not paths:
        raise FileNotFoundError(f"no part-*.parquet under {part_dir}")

    # CONTRACT GUARDS. (1) State is keyed by partition file: if the layout's
    # bucket count changed between runs, conversations migrate buckets and
    # their state would be missed (silently re-emitting old turns) — pin
    # the partition count in a meta file and loud-fail on mismatch.
    # (2) Input must be APPEND-ONLY per conversation: removed/edited rows
    # are not detected (the ts watermark catches reordering, not removal).
    import json

    meta_path = os.path.join(state_dir, "_incremental_meta.json")
    # pin the partition NAME SET, not just the count: a re-bucketed layout
    # can keep the same number of non-empty files under different names
    # (state misses -> silent re-emission), and a valid append can grow the
    # count by filling a previously-empty bucket... but a NEW name whose
    # state file doesn't exist yet is handled (done={}), so new names may
    # only be ADDED, never change existing ones
    meta = {"partitions": sorted(os.path.basename(p) for p in paths),
            "metrics": list(metrics), "phases": list(phases)}
    def _compatible(prev: dict, cur: dict) -> bool:
        if prev.get("metrics") != cur["metrics"] or prev.get("phases") != cur["phases"]:
            return False
        prev_parts = prev.get("partitions")
        if prev_parts is None:  # legacy count-only meta: force rebuild
            return False
        return set(prev_parts) <= set(cur["partitions"])
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev_meta = json.load(f)
        if not _compatible(prev_meta, meta):
            raise ValueError(
                f"incremental state at {state_dir} was checkpointed with "
                f"{prev_meta}, current run has {meta} — the partition name "
                "set may only grow (appends into new buckets) and the "
                "feature config must stay fixed across incremental runs "
                "(rebuild the state dir to change them)"
            )
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    def process(df: pd.DataFrame) -> pd.DataFrame:
        # one block per partition file (include_paths read below)
        part = os.path.basename(df["path"].iloc[0])
        df = df.drop(columns=["path"])
        actor = StreamingWindowActor(metrics=metrics, phases=phases)
        spath = _state_path(state_dir, part)
        if os.path.exists(spath):
            with open(spath, "rb") as f:
                actor.state = pickle.load(f)
        # delta selection by per-conversation processed count: the layout
        # is append-only per conversation and sorted by (conv, ts, tie),
        # so "beyond the first k rows" is exactly the appended suffix
        done = {c: s.turns for c, s in actor.state.items()}
        cc = df.groupby("conv_id").cumcount()
        prev = df["conv_id"].map(done).fillna(0).astype(int)
        delta = df[cc >= prev]
        out = actor(delta)
        tmp = spath + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(actor.state, f)
        os.replace(tmp, spath)  # atomic state checkpoint
        if out.empty:
            # typed Arrow empty: zero-row object columns trip Ray's
            # block-size estimator (same fix as packing.eval_gram_set)
            import pyarrow as pa

            return pa.Table.from_pandas(out, preserve_index=False)
        return out

    ds = ray.data.read_parquet(
        paths, override_num_blocks=len(paths), include_paths=True
    )
    ds = derive_turn_columns(ds)
    # batch_size=None: one batch per block == one whole partition per task,
    # so the per-partition state file is read/written exactly once
    return ds.map_batches(process, batch_format="pandas", batch_size=None)
