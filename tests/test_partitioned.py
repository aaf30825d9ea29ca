"""Partitioned-layout path: ingest once, shuffle-free window job must give
byte-identical features to the shuffle-based engine path."""

import shutil

import numpy as np
import ray.data as rd

from nfl_feature_store_ray.pipelines.partitioned import (
    ingest_partitioned,
    window_features_partitioned,
)
from nfl_feature_store_ray.sources.transcripts import generate_transcripts
from nfl_feature_store_ray.state.window_engine import window_features

PART_DIR = "/tmp/nfl_fs_part_test"
METRICS = ("value", "text_len", "n_tokens")


def test_partitioned_equals_shuffled():
    tbl = generate_transcripts(n_convs=40, mean_turns=12, seed=77)
    ds = rd.from_arrow(tbl)

    shutil.rmtree(PART_DIR, ignore_errors=True)
    man = ingest_partitioned(ds, PART_DIR, num_buckets=8, fingerprint_cols=["conv_id", "turn_idx"])
    assert len(man) <= 8 and man["rows_in"].sum() == tbl.num_rows

    a = (
        window_features_partitioned(PART_DIR, metrics=METRICS, assign_turn_idx=False)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    b = (
        window_features(rd.from_arrow(tbl), metrics=METRICS, num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == tbl.num_rows
    for c in b.columns:
        assert c in a.columns, c
        if b[c].dtype.kind in "fc":
            # polars vs pandas kernels: same semantics, different summation
            # order -> FIXTURES.md parity contract (allclose), not bit-exact
            np.testing.assert_allclose(
                a[c].to_numpy(float), b[c].to_numpy(float),
                rtol=1e-9, atol=1e-12, equal_nan=True, err_msg=c,
            )
        else:
            assert (
                a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()
            ).all(), c
