"""Skew handling: heavy-key detection + dedicated-bucket salting must not
change output, and the hot conversation must land in its own bucket."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nfl_feature_store_ray.sources.transcripts import generate_transcripts
from nfl_feature_store_ray.stages.bucketize import BUCKET_COL, with_bucket
from nfl_feature_store_ray.stages.derive import derive_turn_columns
from nfl_feature_store_ray.state.skew import detect_heavy_keys
from nfl_feature_store_ray.state.window_engine import window_features

METRICS = ("value",)


def test_detect_and_salt_heavy_conversation():
    tbl = generate_transcripts(n_convs=40, mean_turns=12, seed=13)
    ds = rd.from_arrow(tbl)

    heavy = detect_heavy_keys(ds, key="conv_id", min_rows=200)
    # the generator plants conv_00001 as a hot conversation (mean_turns*30)
    assert "conv_00001" in heavy

    # hot conv gets a dedicated bucket beyond the hash range
    bucketed = with_bucket(ds, key="conv_id", num_buckets=8, heavy_keys=heavy).to_pandas()
    hot_buckets = set(bucketed.loc[bucketed.conv_id == "conv_00001", BUCKET_COL])
    assert hot_buckets == {8 + heavy["conv_00001"]}
    other = bucketed.loc[bucketed.conv_id != "conv_00001", BUCKET_COL]
    assert not set(other) & hot_buckets
    # every non-heavy conversation stays in the hash range
    normal = bucketed.loc[~bucketed.conv_id.isin(heavy), BUCKET_COL]
    assert normal.max() < 8
    # each heavy conversation owns exactly one dedicated bucket
    for k, i in heavy.items():
        assert set(bucketed.loc[bucketed.conv_id == k, BUCKET_COL]) == {8 + i}

    # salting must not change the feature output
    base = (
        window_features(rd.from_arrow(tbl), metrics=METRICS, num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    salted = (
        window_features(rd.from_arrow(tbl), metrics=METRICS, num_buckets=8, heavy_keys=heavy)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(base) == len(salted)
    for c in base.columns:
        if base[c].dtype.kind in "fc":
            np.testing.assert_allclose(
                base[c].to_numpy(float), salted[c].to_numpy(float),
                rtol=0, atol=0, equal_nan=True, err_msg=c,
            )
        else:
            assert (base[c].astype(str) == salted[c].astype(str)).all(), c


# ---------------------------------------------------------------------------
# Round 5: sub-range chaining for conversations larger than one worker heap
# ---------------------------------------------------------------------------
CHAIN_EXACT = [
    "conv_id", "ts", "turn_idx", "session_id", "session_turn_idx",
    "n_prior_user", "n_prior_assistant", "n_prior_tool",
    "turns_since_tool", "roll10_tool_rate",
    "last_value", "avg_value", "session_avg_value",
]
CHAIN_ALLCLOSE = ["gap_s", "secs_since_tool", "form_value", "ewma_value"]


def _assert_cols(a: pd.DataFrame, b: pd.DataFrame, exact, allclose):
    for c in exact:
        if a[c].dtype.kind in "fc":
            np.testing.assert_array_equal(
                a[c].to_numpy(), b[c].to_numpy(), err_msg=c)
        else:
            assert a[c].dtype == b[c].dtype, (c, a[c].dtype, b[c].dtype)
            assert (a[c].astype(str) == b[c].astype(str)).all(), c
    for c in allclose:
        np.testing.assert_allclose(
            a[c].astype(float), b[c].astype(float),
            rtol=1e-9, atol=0, equal_nan=True, err_msg=c)


def test_chained_subrange_matches_batch_and_streaming():
    """A hot conversation split into 64-row sub-range tasks with state
    handoff must (a) match the one-task batch kernel per the streaming
    precision contract — BIT-identical on the cents-exact families,
    rtol 1e-9 on float-order families — and (b) be fully BITWISE equal
    to a single in-process streaming actor fed the same splits, proving
    the cross-task handoff itself is lossless."""
    from nfl_feature_store_ray.state.skew import (
        _stream_cols, window_features_chained)
    from nfl_feature_store_ray.state.streaming import StreamingWindowActor

    tbl = generate_transcripts(n_convs=40, mean_turns=12, seed=13)
    heavy = detect_heavy_keys(rd.from_arrow(tbl), key="conv_id", min_rows=200)
    assert heavy, "generator must plant a hot conversation"
    R = 64

    chained = (
        window_features_chained(
            rd.from_arrow(tbl), metrics=METRICS, heavy_keys=heavy,
            sub_range_rows=R, tie_col="turn_idx", num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    # the planted hot conversation genuinely chained over multiple tasks
    n_hot = int((chained.conv_id == "conv_00001").sum())
    assert n_hot > 2 * R

    base = (
        window_features(rd.from_arrow(tbl), metrics=METRICS, num_buckets=8,
                        assign_turn_idx=True)
        .to_pandas()[_stream_cols(METRICS, ())]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(chained) == len(base) == tbl.num_rows
    _assert_cols(chained, base, CHAIN_EXACT, CHAIN_ALLCLOSE)

    # (b) bitwise vs ONE actor fed identical sub-range splits in order
    hdf = tbl.to_pandas()
    hdf = (
        hdf[hdf.conv_id.isin(heavy)]
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    actor = StreamingWindowActor(metrics=METRICS)
    outs = []
    for _, g in hdf.groupby("conv_id", sort=True):
        g = g.reset_index(drop=True)
        for a in range(0, len(g), R):
            outs.append(actor(g.iloc[a:a + R]))
    one = (
        pd.concat(outs, ignore_index=True)
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    ch_h = (
        chained[chained.conv_id.isin(heavy)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(one) == len(ch_h)
    _assert_cols(ch_h, one, list(one.columns), [])


@pytest.mark.parametrize("phases", [(), ("user", "assistant")])
def test_chained_state_handoff_is_lossless_across_pickle(phases):
    """The carry state must survive serialization between chain tasks:
    actor A consumes batches 1..k; its pickled+restored state must drive
    batch k+1 bitwise-identically to the uninterrupted actor — including
    the EWMA register, session seeds, per-phase registers, and the
    NULL-tail cases."""
    import pickle

    from nfl_feature_store_ray.state.streaming import StreamingWindowActor

    tbl = generate_transcripts(n_convs=6, mean_turns=40, seed=99)
    df = (
        tbl.to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    # plant NULL values near a split boundary to cross NULL-skip state
    df.loc[df.index[:120:7], "value"] = np.nan

    a_full = StreamingWindowActor(metrics=METRICS, phases=phases)
    a_head = StreamingWindowActor(metrics=METRICS, phases=phases)
    cut = len(df) // 2
    outs_full = [a_full(df.iloc[:cut]), a_full(df.iloc[cut:])]
    out_head = a_head(df.iloc[:cut])
    a_tail = StreamingWindowActor(metrics=METRICS, phases=phases)
    a_tail.state = pickle.loads(pickle.dumps(a_head.state))
    out_tail = a_tail(df.iloc[cut:])
    full = pd.concat(outs_full, ignore_index=True)
    split = pd.concat([out_head, out_tail], ignore_index=True)
    _assert_cols(split, full, list(full.columns), [])


def test_chained_all_conversations_heavy():
    """Every conversation heavy -> the normal branch contributes ZERO
    rows to the union; the chain must still emit every row once."""
    from nfl_feature_store_ray.state.skew import window_features_chained

    frames = []
    for c in range(3):
        n = 50
        frames.append(pd.DataFrame({
            "conv_id": f"c{c}", "turn_idx": np.arange(n, dtype="int32"),
            "role": "user", "text": "t", "tool": None,
            "ts": pd.date_range("2024-01-01", periods=n,
                                freq="s").astype("datetime64[us]"),
            "value": np.round(np.random.default_rng(c).random(n) * 9, 2)}))
    df = pd.concat(frames, ignore_index=True)
    out = window_features_chained(
        rd.from_pandas(df), metrics=("value",),
        heavy_keys={"c0": 0, "c1": 1, "c2": 2},
        sub_range_rows=16, tie_col="turn_idx",
    ).to_pandas()
    assert len(out) == 150 and out.conv_id.nunique() == 3
    assert (out.groupby("conv_id")["turn_idx"].max() == 49).all()


def test_chained_subrange_phase_families_match_batch():
    """Per-role (phase) window families must survive the chain's
    cross-task state handoff: cents-exact phase aggregates bitwise vs
    the batch kernel, float-order phase families within rtol 1e-9."""
    from nfl_feature_store_ray.state.skew import (
        _stream_cols, window_features_chained)

    PH = ("user", "assistant")
    tbl = generate_transcripts(n_convs=40, mean_turns=12, seed=13)
    heavy = detect_heavy_keys(rd.from_arrow(tbl), key="conv_id", min_rows=200)
    chained = (
        window_features_chained(
            rd.from_arrow(tbl), metrics=METRICS, heavy_keys=heavy,
            sub_range_rows=64, tie_col="turn_idx", num_buckets=8, phases=PH)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    base = (
        window_features(rd.from_arrow(tbl), metrics=METRICS, num_buckets=8,
                        assign_turn_idx=True, phases=PH)
        .to_pandas()[_stream_cols(METRICS, PH)]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(chained) == len(base) == tbl.num_rows
    exact = [f"{f}_value_{p}" for p in PH for f in ("last", "avg")]
    allc = [f"{f}_value_{p}" for p in PH for f in ("form", "ewma")]
    _assert_cols(chained, base, CHAIN_EXACT + exact, CHAIN_ALLCLOSE + allc)
