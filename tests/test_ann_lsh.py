"""LSH-bucketed ANN quality gates.

Approximate by construction, so the driver gate is rows-only; these pin
what it can't: recall on a PLANTED near-duplicate corpus (the workload
signature LSH exists for — random-hyperplane collisions are exponentially
unlikely at the 60-degree angles of a near-uniform corpus, which is the
documented contract at pipelines/similarity.py's LSH section),
determinism, and ranking sanity on the shipped corpus."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from nfl_feature_store_ray.pipelines.similarity import N_QUERIES, q_ann_lsh

SF = "/root/testdata/sf0.001"
PLANTED_DIR = "/tmp/nfl_fs_ann_lsh_planted"


@pytest.fixture(scope="module")
def planted_dir():
    """200 background vectors + a near-identical twin for each of the
    N_QUERIES query vectors (queries = lowest vec_ids)."""
    rng = np.random.default_rng(99)
    base = rng.normal(size=(200, 64))
    twins = base[:N_QUERIES] + rng.normal(scale=0.02, size=(N_QUERIES, 64))
    vecs = np.vstack([base, twins])
    ids = list(range(200)) + [1000 + i for i in range(N_QUERIES)]
    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    shutil.rmtree(PLANTED_DIR, ignore_errors=True)
    os.makedirs(PLANTED_DIR)
    df.to_parquet(os.path.join(PLANTED_DIR, "embeddings.parquet"), index=False)
    yield PLANTED_DIR


def test_lsh_finds_planted_twins(planted_dir):
    out = q_ann_lsh(planted_dir)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    top1 = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
    found = sum(int(top1.get(q, -1)) == 1000 + q for q in range(N_QUERIES))
    # cos ~0.999 twins collide in >=1 of 8 8-bit tables w.p. ~1 - 1e-5 each
    assert found >= N_QUERIES - 1, f"only {found}/{N_QUERIES} twins found"


def test_lsh_deterministic_and_ranked():
    a = q_ann_lsh(SF)
    a = a.to_pandas() if not isinstance(a, pd.DataFrame) else a
    b = q_ann_lsh(SF)
    b = b.to_pandas() if not isinstance(b, pd.DataFrame) else b
    assert a.equals(b)
    for _, g in a.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["cos_sim"].to_numpy()[:-1] >= g["cos_sim"].to_numpy()[1:]).all()
