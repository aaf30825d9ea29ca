"""Distributed k-means parity vs a single-process numpy oracle.

kmeans_embed is iterative (not SQL-expressible), so the driver gate is
rows-only; these tests pin what the gate can't: exact parity of the
distributed partial-fold implementation with a straightforward numpy
Lloyd's run of the SAME algorithm (same init, same iteration count), and
determinism across runs.
"""

import numpy as np
import pyarrow.parquet as pq

from nfl_feature_store_ray.pipelines.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    _norm_rows,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(k: int, iters: int):
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    v = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    cent = v[:k].copy()  # k lowest vec_ids — same deterministic init
    ns = inerts = None
    for _ in range(iters):
        sims = v @ cent.T
        assign = sims.argmax(axis=1)
        inert_row = 2.0 - 2.0 * sims[np.arange(len(v)), assign]
        new_cent = cent.copy()
        ns, inerts = np.zeros(k, np.int64), np.zeros(k)
        for c in range(k):
            sel = assign == c
            ns[c] = sel.sum()
            inerts[c] = inert_row[sel].sum()
            if ns[c]:
                new_cent[c] = v[sel].mean(axis=0)
        cent = _norm_rows(new_cent)
    return cent, ns, inerts


def test_kmeans_matches_numpy_oracle():
    cent, summary = kmeans_fit(SF, KMEANS_K, KMEANS_ITERS)
    ocent, ons, oinerts = _numpy_kmeans(KMEANS_K, KMEANS_ITERS)
    assert (summary["n"].to_numpy() == ons).all()
    np.testing.assert_allclose(cent, ocent, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        summary["inertia"].to_numpy(), np.round(oinerts, 6), rtol=1e-6, atol=1e-6
    )
    # every vector assigned somewhere
    assert summary["n"].sum() == pq.read_table(f"{SF}/embeddings.parquet").num_rows


def test_kmeans_deterministic():
    _, s1 = kmeans_fit(SF, KMEANS_K, 2)
    _, s2 = kmeans_fit(SF, KMEANS_K, 2)
    assert s1.equals(s2)
