"""Runner: registry materialization + incremental upsert via manifests."""

import glob
import shutil

from nfl_feature_store_ray.runner import run_stores

OUT = "/tmp/nfl_fs_runner_test"


def test_runner_materializes_and_upserts():
    shutil.rmtree(OUT, ignore_errors=True)
    first = run_stores("/root/testdata/sf0.001", OUT, num_buckets=4)
    names = {r["store"] for r in first}
    assert names == {
        "turn_window_features", "conv_career", "event_day_pivot",
        "turn_window_features_wide",
    }
    for r in first:
        assert r["skipped"] == 0 and r["rows"] > 0
        assert len(glob.glob(f"{r['out']}/part-*.parquet")) == r["partitions"]
        assert len(glob.glob(f"{r['out']}/part-*.json")) == r["partitions"]

    # unchanged input -> every partition of every store skipped
    second = run_stores("/root/testdata/sf0.001", OUT, num_buckets=4)
    for r in second:
        assert r["skipped"] == r["partitions"], r

    # store selection
    only = run_stores("/root/testdata/sf0.001", OUT, stores=["conv_career"], num_buckets=4)
    assert [r["store"] for r in only] == ["conv_career"]
