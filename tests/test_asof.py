"""As-of join: strict t' < t semantics vs pandas merge_asof oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from nfl_feature_store_ray.state.asof import asof_join


def _frames():
    rng = np.random.default_rng(5)
    convs = [f"c{i}" for i in range(20)]
    feat_rows, ev_rows = [], []
    base = pd.Timestamp("2024-01-01")
    for c in convs:
        n = int(rng.integers(1, 30))
        ts = base + pd.to_timedelta(np.sort(rng.integers(0, 10**6, n)), unit="s")
        for t in ts:
            feat_rows.append({"conv_id": c, "ts": t, "feat": float(rng.random())})
        m = int(rng.integers(1, 20))
        ets = base + pd.to_timedelta(rng.integers(-10, 10**6 + 10, m), unit="s")
        for t in ets:
            ev_rows.append({"conv_id": c, "ts": pd.Timestamp(t), "ev": int(rng.integers(100))})
    feats = pd.DataFrame(feat_rows)
    events = pd.DataFrame(ev_rows)
    # boundary case: event at EXACTLY a feature ts (strict < must exclude it)
    events.loc[0, "ts"] = feats.loc[0, "ts"]
    events.loc[0, "conv_id"] = feats.loc[0, "conv_id"]
    return events, feats


def test_asof_strict_backward():
    events, feats = _frames()
    out = asof_join(
        rd.from_pandas(events), rd.from_pandas(feats), key="conv_id", on="ts", num_buckets=4
    ).to_pandas()

    expected = pd.merge_asof(
        events.sort_values(["ts", "conv_id"], kind="mergesort"),
        feats.sort_values(["ts", "conv_id"], kind="mergesort"),
        on="ts",
        by="conv_id",
        allow_exact_matches=False,
        direction="backward",
    )
    key = ["conv_id", "ts", "ev"]
    o = out.sort_values(key, kind="mergesort").reset_index(drop=True)
    e = expected.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(o) == len(e) == len(events)
    np.testing.assert_allclose(
        o["feat"].to_numpy(), e["feat"].to_numpy(), rtol=0, atol=0, equal_nan=True
    )
    # no-leakage: every matched feature ts is strictly earlier — re-verify row-wise
    merged_ts = pd.merge_asof(
        events.sort_values(["ts", "conv_id"], kind="mergesort"),
        feats.rename(columns={"feat": "f2"}).assign(fts=lambda d: d.ts).sort_values(
            ["ts", "conv_id"], kind="mergesort"
        ),
        on="ts",
        by="conv_id",
        allow_exact_matches=False,
    )
    m = merged_ts.dropna(subset=["fts"])
    assert (m["fts"] < m["ts"]).all()
