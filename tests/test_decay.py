"""Time-decayed sum kernel: chunked-scan == O(n^2) pairwise reference,
chunk-split invariance, and the leakage (prefix-truncation) property."""

import numpy as np
import pandas as pd

from nfl_feature_store_ray.state.decay import (
    time_decayed_sum,
    time_decayed_sum_reference,
)


def _frame(n_convs=25, mean_turns=30, seed=9):
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_700_000_000.0
    for c in range(n_convs):
        t = t0 + c * 10_000
        for k in range(int(rng.integers(2, mean_turns * 2))):
            # mix of sub-second steps, ties, and multi-hour gaps
            r = rng.random()
            dt = 0.0 if r < 0.1 else (30_000.0 if r > 0.95 else float(rng.integers(1, 120)))
            t += dt
            rows.append((c, t, float(np.round(rng.random() * 10, 2))))
    df = pd.DataFrame(rows, columns=["conv", "t", "x"])
    return df.sort_values(["conv", "t"], kind="mergesort").reset_index(drop=True)


def test_chunked_scan_matches_pairwise_reference():
    df = _frame()
    x = df["x"].to_numpy()
    t = df["t"].to_numpy()
    c = df["conv"].to_numpy(dtype=np.int64)
    got = time_decayed_sum(x, t, c)
    ref = time_decayed_sum_reference(x, t, c)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-15)
    assert got[0] == 0.0  # first row of first conv has no prior


def test_chunk_size_invariance():
    df = _frame(seed=10)
    x, t, c = df["x"].to_numpy(), df["t"].to_numpy(), df["conv"].to_numpy(np.int64)
    base = time_decayed_sum(x, t, c, chunk=64)
    for chunk in (1, 2, 7, 33, 1000):
        np.testing.assert_allclose(
            time_decayed_sum(x, t, c, chunk=chunk), base, rtol=1e-12,
            err_msg=f"chunk={chunk}",
        )


def test_prefix_truncation_leakage_property():
    """Features for rows <= T must not change when later rows are removed."""
    df = _frame(seed=11)
    x, t, c = df["x"].to_numpy(), df["t"].to_numpy(), df["conv"].to_numpy(np.int64)
    full = time_decayed_sum(x, t, c)
    cut = len(df) * 2 // 3
    part = time_decayed_sum(x[:cut], t[:cut], c[:cut])
    # allclose, not bitwise: the last shared chunk's tril@X runs over
    # different matrix widths, and BLAS may group summands differently
    np.testing.assert_allclose(full[:cut], part, rtol=1e-12, atol=0)


def test_query_end_to_end_rows():
    import ray.data  # noqa: F401  (session via conftest)

    from nfl_feature_store_ray.pipelines.transcript_queries import q_time_decay

    out = q_time_decay("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 1000
    assert set(out.columns) == {"conv_id", "turn_idx", "decay_sum"}
    first = out.sort_values(["conv_id", "turn_idx"]).groupby("conv_id").head(1)
    assert (first["decay_sum"] == 0.0).all()
