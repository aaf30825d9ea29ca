"""Multimodal plumbing: binary schema round-trip, actor-pool featurize,
frame sampling, and the clearly-marked stub boundary."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nfl_feature_store_ray.pipelines.multimodal import (
    MediaFeaturizer,
    generate_media,
    media_features,
    sample_frames,
)


def test_media_features_deterministic():
    tbl = generate_media(n=32, seed=17)
    out = media_features(rd.from_arrow(tbl)).to_pandas().sort_values("media_id")
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "kind", "n_bytes", "digest", "byte_hist"}
    h = np.stack(out["byte_hist"].to_numpy())
    assert h.shape == (32, 16)
    np.testing.assert_allclose(h.sum(axis=1), 1.0, rtol=1e-9)

    out2 = media_features(rd.from_arrow(tbl)).to_pandas().sort_values("media_id")
    assert (out["digest"].to_numpy() == out2["digest"].to_numpy()).all()


def test_frame_sampler_video_only():
    tbl = generate_media(n=30, seed=17)
    frames = sample_frames(rd.from_arrow(tbl)).to_pandas()
    assert len(frames) > 0
    video_ids = {
        m for m, k in zip(tbl["media_id"].to_pylist(), tbl["kind"].to_pylist()) if k == "video"
    }
    assert set(frames["media_id"]).issubset(video_ids)
    assert (frames["frame_idx"] % 4 == 0).all()
    assert all(len(f) == 64 for f in frames["frame"])


def test_real_decode_is_stubbed():
    f = MediaFeaturizer(decode_real=True)
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"xx"], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    with pytest.raises(NotImplementedError):
        f(batch)
