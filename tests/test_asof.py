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


def test_asof_nearest_tie_pinned_backward():
    """direction='nearest' must pick the closer side and pin the
    equal-distance tie to BACKWARD (the engine's documented rule — pandas
    leaves it unspecified, so this is asserted against a hand-built truth
    table, not merge_asof)."""
    base = pd.Timestamp("2024-01-01 12:00:00")
    left = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "a", "b"],
            "ts": [
                base,                                # exact tie: bwd@-10s, fwd@+10s
                base + pd.Timedelta(seconds=100),    # closer forward (+5s vs -90s)
                base - pd.Timedelta(seconds=3600),   # only forward exists
                base + pd.Timedelta(seconds=10**6),  # only backward exists
                base,                                # conv with no right rows at all
            ],
            "k": [0, 1, 2, 3, 4],
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a"],
            "ts": [
                base - pd.Timedelta(seconds=10),
                base + pd.Timedelta(seconds=10),
                base + pd.Timedelta(seconds=105),
            ],
            "v": [1.0, 2.0, 3.0],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right), key="conv_id", on="ts",
            allow_exact_matches=True, direction="nearest", num_buckets=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=0: tie -> backward (v=1); k=1: nearest is +5s (v=3);
    # k=2: no backward -> forward (v=1); k=3: no forward -> backward (v=3);
    # k=4: no match -> NaN
    np.testing.assert_allclose(
        out["v"].to_numpy(), [1.0, 3.0, 1.0, 3.0, np.nan], equal_nan=True
    )
