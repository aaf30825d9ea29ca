"""Skew handling: heavy-key detection + dedicated-bucket salting must not
change output, and the hot conversation must land in its own bucket."""

import numpy as np
import pandas as pd
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
