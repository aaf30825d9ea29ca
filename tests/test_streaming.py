"""Streaming incremental engine == batch engine, for every batch split.

The actor's carry state (raw tails + registers + watermark) must produce
bit-compatible features whether a conversation arrives in one batch, in
tiny 3-row slices, or row by row."""

import numpy as np
import pandas as pd
import pytest

from nfl_feature_store_ray.sources.transcripts import generate_transcripts
from nfl_feature_store_ray.state.streaming import StreamingWindowActor
from nfl_feature_store_ray.state.window_engine import compute_bucket_windows

METRICS = ("value", "text_len")


def _sorted_frame() -> pd.DataFrame:
    df = (
        generate_transcripts(n_convs=25, mean_turns=15, seed=19)
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    df["text_len"] = df["text"].str.len().astype("float64")
    for r in ("user", "assistant", "tool"):
        df[f"is_{r}"] = (df["role"] == r).astype("int8")
    return df


def _batch_reference(df: pd.DataFrame) -> pd.DataFrame:
    return compute_bucket_windows(df.copy(), metrics=METRICS)


@pytest.mark.parametrize("batch_size", [1, 3, 17, 10_000])
def test_streaming_matches_batch(batch_size):
    df = _sorted_frame()
    ref = _batch_reference(df)

    actor = StreamingWindowActor(metrics=METRICS)
    outs = [
        actor(df.iloc[i : i + batch_size])
        for i in range(0, len(df), batch_size)
    ]
    got = pd.concat(outs, ignore_index=True)

    assert len(got) == len(ref)
    check_cols = [
        "turn_idx", "gap_s", "session_id", "session_turn_idx",
        "n_prior_user", "n_prior_assistant", "n_prior_tool",
        "turns_since_tool", "secs_since_tool", "roll10_tool_rate",
    ] + [f"{fam}_{m}" for m in METRICS for fam in ("last", "form", "avg", "ewma")] + [
        f"session_avg_{m}" for m in METRICS
    ]
    for c in check_cols:
        a = got[c].to_numpy(dtype="float64")
        b = ref[c].to_numpy(dtype="float64")
        np.testing.assert_allclose(
            a, b, rtol=1e-9, atol=1e-12, equal_nan=True,
            err_msg=f"{c} at batch_size={batch_size}",
        )


def test_watermark_violation_rejected():
    df = _sorted_frame()
    actor = StreamingWindowActor(metrics=("value",))
    actor(df)
    with pytest.raises(ValueError, match="watermark"):
        actor(df.head(5))  # replayed past data: ts before watermark


def test_state_is_bounded():
    """Hot-conversation memory: state per conversation is O(tail+registers),
    independent of conversation length."""
    df = _sorted_frame()
    actor = StreamingWindowActor(metrics=METRICS)
    for i in range(0, len(df), 64):
        actor(df.iloc[i : i + 64])
    for s in actor.state.values():
        assert len(s.tool_ring) <= 10
        for ms in s.metrics.values():
            assert len(ms.tail) <= 10


@pytest.mark.parametrize("batch_size", [1, 7, 10_000])
def test_streaming_phase_windows_match_batch(batch_size):
    """Per-phase families carry across batch splits bit-compatibly with the
    batch kernel (avg is cents-exact on both paths -> bit-identical)."""
    phases = ("user", "assistant")
    df = _sorted_frame()
    ref = compute_bucket_windows(df.copy(), metrics=METRICS, phases=phases)

    actor = StreamingWindowActor(metrics=METRICS, phases=phases)
    outs = [
        actor(df.iloc[i : i + batch_size]) for i in range(0, len(df), batch_size)
    ]
    got = pd.concat(outs, ignore_index=True)
    assert len(got) == len(ref)
    for m in METRICS:
        for p in phases:
            for fam in ("last", "form", "avg", "ewma"):
                c = f"{fam}_{m}_{p}"
                np.testing.assert_allclose(
                    got[c].to_numpy(dtype="float64"),
                    ref[c].to_numpy(dtype="float64"),
                    rtol=1e-9, atol=1e-12, equal_nan=True,
                    err_msg=f"{c} at batch_size={batch_size}",
                )
            a = got[f"avg_{m}_{p}"].to_numpy(dtype="float64")
            b = ref[f"avg_{m}_{p}"].to_numpy(dtype="float64")
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), f"avg_{m}_{p} not exact"


def test_empty_batch_schema_matches_nonempty_order():
    """A zero-row batch must emit the exact column ORDER of non-empty
    batches (Ray unifies block schemas positionally for pandas blocks)."""
    phases = ("user", "assistant")
    actor = StreamingWindowActor(metrics=METRICS, phases=phases)
    df = _sorted_frame()
    nonempty = actor(df)
    empty = actor(df.iloc[0:0])
    assert list(empty.columns) == list(nonempty.columns)
    assert len(empty) == 0
