"""Dyadic time-decay kernel: correctness against a plain per-row reference
recurrence, NULL/clamp edges, and the giant-conversation scale shape (the
group loop must cost O(minute groups), not O(turns) — a dense
same-minute conversation collapses to few iterations)."""

import time

import numpy as np
import pandas as pd

from nfl_feature_store_ray.pipelines.transcript_queries import (
    DYADIC_DECAY_US,
    q_time_decay_dyadic,
)


def _reference(df: pd.DataFrame) -> pd.DataFrame:
    """Per-row python recurrence — the independent oracle."""
    out = []
    for conv, g in df.sort_values(["conv_id", "ts", "_seq"]).groupby("conv_id"):
        s = 0
        prev_us = None
        for i, (_, row) in enumerate(g.iterrows()):
            us = int(pd.Timestamp(row["ts"]).value // 1000)
            if i == 0:
                prior = 0
            else:
                k = min((us - prev_us) // DYADIC_DECAY_US, 63)
                prior = s >> k
            v = row["value"]
            c = 0 if pd.isna(v) else max(int(np.rint(v * 100.0)), 0)
            out.append((conv, i, prior / 100.0))
            s = prior + c
            prev_us = us
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "decay_sum"])


def _events(rng, n_users=6, max_n=80, null_rate=0.1) -> pd.DataFrame:
    rows, eid = [], 0
    base = pd.Timestamp("2024-06-01")
    for u in range(n_users):
        t = base
        for _ in range(int(rng.integers(2, max_n))):
            # mix of same-minute bursts, minute-scale gaps, and huge gaps
            r = rng.random()
            dt = 0 if r < 0.4 else (int(rng.integers(30, 600)) if r < 0.9
                                    else 10_000_000)
            t = t + pd.Timedelta(seconds=dt)
            v = None if rng.random() < null_rate else float(
                np.round(rng.random() * 300, 2))
            rows.append((eid, t, u, "click", v, "{}"))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                     "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = ev["value"].astype("float64")
    return ev


def test_dyadic_matches_reference(tmp_path, ray_session):
    rng = np.random.default_rng(42)
    ev = _events(rng)
    d = tmp_path / "dy"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)
    got = q_time_decay_dyadic(str(d)).to_pandas()
    ts = ev.rename(columns={"user_id": "conv_id", "event_id": "_seq"})
    ts["conv_id"] = ts["conv_id"].astype(str)
    want = _reference(ts[["conv_id", "ts", "_seq", "value"]])
    m = got.merge(want, on=["conv_id", "turn_idx"], suffixes=("", "_ref"))
    assert len(m) == len(want) == len(got)
    np.testing.assert_allclose(m["decay_sum"], m["decay_sum_ref"], rtol=0, atol=0)


def test_dyadic_giant_dense_conversation_is_group_bounded(ray_session, tmp_path):
    """200k turns packed into ~400 minute groups: the kernel's sequential
    loop runs per GROUP, so this must complete in seconds, and the final
    state must equal the reference computed on the group sums."""
    n = 200_000
    rng = np.random.default_rng(7)
    # ~500 same-minute turns per group burst, then a 2-minute gap
    gaps = np.where(np.arange(n) % 500 == 0, 120.0, 0.0)
    gaps[0] = 0
    ts = (pd.Timestamp("2024-06-01").value // 1000
          + np.cumsum(gaps * 1e6)).astype("int64")
    ev = pd.DataFrame(
        {"event_id": np.arange(n, dtype="int64"),
         "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
         "user_id": 1, "event_type": "click",
         "value": np.round(rng.random(n) * 10, 2), "props": "{}"}
    )
    d = tmp_path / "giant"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)
    t0 = time.perf_counter()
    got = q_time_decay_dyadic(str(d)).to_pandas()
    wall = time.perf_counter() - t0
    assert len(got) == n
    assert wall < 60, f"group-bounded kernel took {wall:.1f}s on a dense giant conv"
    # spot-check the strictly-prior invariant at a group boundary: the
    # first row of group g sees the decayed end-state of group g-1
    got = got.sort_values("turn_idx").reset_index(drop=True)
    c = np.maximum(np.rint(ev["value"].to_numpy() * 100.0), 0).astype(np.int64)
    s = 0
    for gstart in (0, 500, 1000):
        if gstart > 0:
            assert got.loc[gstart, "decay_sum"] == round((s >> 2) / 100.0, 6)
            s = (s >> 2) + c[gstart:gstart + 500].sum()
        else:
            assert got.loc[0, "decay_sum"] == 0.0
            s = c[0:500].sum()


def test_expanding_corr_null_value_odd_token_parity(tmp_path, ray_session):
    """Regression: the unmasked NaN->int64 cast in the corr moments is
    wrap-immune for the square terms but NOT the x*y cross term — the
    2^63 residue survives exactly when a NULL-value row's token count is
    ODD. This corpus pins that case (3-token props on null-value rows)."""
    import duckdb
    import __ray_entry__ as e

    rng = np.random.default_rng(5)
    n = 60
    ev = pd.DataFrame(
        {"event_id": np.arange(n, dtype="int64"),
         "ts": (pd.Timestamp("2024-07-01")
                + pd.to_timedelta(np.arange(n) * 40, unit="s")).astype("datetime64[us]"),
         "user_id": np.repeat([1, 2, 3], 20),
         "event_type": "click",
         "value": [None if i % 7 == 3 else float(np.round(rng.random() * 90, 2))
                   for i in range(n)],
         # VARYING token counts (else numy == 0 gates every row to NaN on
         # both sides and the regression can't bite); null-value rows get
         # an ODD count so the 2^63 cross-term residue survives
         "props": [("a b c" if i % 7 == 3 else ("x y" if i % 2 else "p q r s"))
                   for i in range(n)]}
    )
    ev["value"] = ev["value"].astype("float64")
    d = tmp_path / "corrnull"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)
    r = e.queries()["w_expanding_corr"](str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    s = con.execute(e.oracle_sql()["w_expanding_corr"]).df()
    m = r.merge(s, on=["conv_id", "turn_idx"], suffixes=("", "_o"))
    assert len(m) == len(r) == len(s)
    np.testing.assert_allclose(
        m["corr_val_tokens"], m["corr_val_tokens_o"], rtol=1e-9, equal_nan=True
    )
