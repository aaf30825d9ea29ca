"""Property-based parity: random transcript shapes (incl. ts ties, session
gaps, single-turn convs) — the batch kernel, the polars kernel, and the
streaming actor must all match the naive oracle."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from nfl_feature_store_ray.state.streaming import StreamingWindowActor
from nfl_feature_store_ray.state.window_engine import compute_bucket_windows
from nfl_feature_store_ray.state.window_kernel_pl import compute_bucket_windows_pl
from tests.oracle import assert_feature_parity, oracle_windows

ROLES = ["user", "assistant", "tool"]


@st.composite
def transcript_frames(draw):
    n_convs = draw(st.integers(1, 5))
    rows = []
    base = pd.Timestamp("2024-01-01")
    for ci in range(n_convs):
        n = draw(st.integers(1, 25))
        # gaps in seconds; occasionally 0 (ts tie) or > session threshold
        gaps = draw(
            st.lists(
                st.sampled_from([0, 1, 30, 600, 90_000, 200_000]),
                min_size=n, max_size=n,
            )
        )
        t = base
        for i in range(n):
            t = t + pd.Timedelta(seconds=int(gaps[i]) if i > 0 else 0)
            rows.append(
                {
                    "conv_id": f"c{ci}",
                    "turn_idx": np.int32(i),
                    "role": draw(st.sampled_from(ROLES)),
                    "text": "x" * draw(st.integers(0, 5)),
                    "tool": None,
                    "ts": t,
                    "value": float(draw(st.integers(0, 100))),
                }
            )
    return pd.DataFrame(rows)


def _prep(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["text_len"] = df["text"].str.len().astype("float64")
    for r in ROLES:
        df[f"is_{r}"] = (df["role"] == r).astype("int8")
    return df


@settings(max_examples=25, deadline=None, derandomize=True)
@given(transcript_frames())
def test_kernels_match_oracle(raw):
    df = _prep(raw)
    orc = oracle_windows(raw.copy().assign(text_len=raw["text"].str.len()), metrics=("value",))

    batch = compute_bucket_windows(df.copy(), metrics=("value",))
    assert_feature_parity(batch, orc)

    polars_out = compute_bucket_windows_pl(df.copy(), metrics=("value",))
    assert_feature_parity(polars_out, orc)

    actor = StreamingWindowActor(metrics=("value",))
    stream = pd.concat(
        [actor(df.iloc[i : i + 7]) for i in range(0, len(df), 7)], ignore_index=True
    )
    assert_feature_parity(stream, orc[[c for c in orc.columns if c in stream.columns]])
