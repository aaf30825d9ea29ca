"""Window engine vs the naive oracle (SURVEY §5.2 item 1-2)."""

import pandas as pd
import pytest
import ray.data as rd

from nfl_feature_store_ray.sources.transcripts import generate_transcripts
from nfl_feature_store_ray.state.window_engine import window_features
from tests.oracle import assert_feature_parity, oracle_windows

METRICS = ("value", "text_len")


@pytest.fixture(scope="module")
def synth():
    # 60 convs incl. a single-turn conv (edge: all windows null) and a hot
    # conv (~skew); shuffled physical order (engine must sort).
    return generate_transcripts(n_convs=60, mean_turns=15, seed=11)


@pytest.fixture(scope="module")
def engine_out(synth):
    ds = rd.from_arrow(synth)
    out = window_features(ds, metrics=METRICS, num_buckets=8)
    return out.to_pandas()


def _oracle(synth):
    df = synth.to_pandas()
    df["text_len"] = df["text"].str.len()
    return oracle_windows(df, metrics=METRICS)


def test_feature_parity(engine_out, synth):
    assert_feature_parity(engine_out, _oracle(synth))


def test_single_turn_conv_all_null(engine_out):
    g = engine_out[engine_out.conv_id == "conv_00000"]
    assert len(g) == 1
    row = g.iloc[0]
    for c in ["last_value", "form_value", "avg_value", "ewma_value", "session_avg_value",
              "gap_s", "turns_since_tool", "roll10_tool_rate"]:
        assert pd.isna(row[c]), c
    assert row["session_id"] == 0 and row["session_turn_idx"] == 0


def test_text_roundtrip_byte_identical(engine_out, synth):
    """North-rule invariant: per-turn text equality under stable ordering."""
    e = engine_out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    o = (
        synth.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (e["text"].fillna("") == o["text"].fillna("")).all()
    assert (e["conv_id"] == o["conv_id"]).all()
    assert (e["turn_idx"].to_numpy() == o["turn_idx"].to_numpy()).all()


def test_shift_semantics_strict(engine_out):
    """last_X at turn k equals raw X at turn k-1 (ref probe 1)."""
    e = engine_out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    g = e.groupby("conv_id", sort=False)
    expected = g["value"].shift()
    pd.testing.assert_series_equal(
        e["last_value"], expected, check_names=False, check_dtype=False
    )
