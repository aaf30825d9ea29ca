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


def test_ann_pq_planted_duplicate_and_recall(ray_session, tmp_path):
    """PQ quality gate: an exact duplicate of a query shares its codes, so
    it must surface at rank 1; and corpus recall@5 vs brute force must be
    far above the 1% random floor (deterministic: sample, seeds, and math
    are all pinned)."""
    import numpy as np
    import pandas as pd

    from nfl_feature_store_ray.pipelines.similarity import (
        TOP_K,
        q_ann_cosine_topk,
        q_ann_pq,
    )

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(300, 64))
    vecs[77] = vecs[3]          # exact duplicate of query 3
    vecs[150] = vecs[7] * 2.5   # scaled duplicate of query 7 (same direction)
    df = pd.DataFrame(
        {"vec_id": range(300),
         "embedding": [v.astype(np.float32).tolist() for v in vecs],
         "label": 0}
    )
    d = tmp_path / "pq"
    d.mkdir()
    df.to_parquet(d / "embeddings.parquet", index=False)
    pq = q_ann_pq(str(d))
    assert pq.loc[(pq.query_id == 3) & (pq["rank"] == 1), "neighbor_id"].iloc[0] == 77
    assert pq.loc[(pq.query_id == 7) & (pq["rank"] == 1), "neighbor_id"].iloc[0] == 150
    # recall floor on the real test embeddings
    ex = q_ann_cosine_topk("/root/testdata/sf0.01")
    got = q_ann_pq("/root/testdata/sf0.01")
    hits = 0
    for q in ex["query_id"].unique():
        hits += len(set(ex[ex.query_id == q]["neighbor_id"])
                    & set(got[got.query_id == q]["neighbor_id"]))
    recall = hits / len(ex)
    assert recall >= 0.2, f"PQ recall@{TOP_K} collapsed: {recall}"


def test_final_topk_shuffle_fold_matches_driver_merge(ray_session):
    """The >ANN_DRIVER_MAX_BLOCKS keyed-shuffle fold must be bit-identical
    to the small-scale driver merge (r04 verdict #7: no driver table that
    grows with block count on any ANN path)."""
    import numpy as np
    import pandas as pd
    import ray

    from nfl_feature_store_ray.pipelines import similarity as sim

    rng = np.random.default_rng(42)
    parts = []
    for _ in range(24):  # 24 blocks of per-block partial top-k rows
        nrow = int(rng.integers(5, 30))
        parts.append(pd.DataFrame({
            "query_id": rng.integers(0, 6, nrow).astype("int64"),
            "neighbor_id": rng.integers(0, 500, nrow).astype("int64"),
            "cos_sim": np.round(rng.random(nrow), 6),
        }))
    ds = ray.data.from_pandas(parts)
    want = sim._final_topk(pd.concat(parts, ignore_index=True), 5)

    old = sim.ANN_DRIVER_MAX_BLOCKS
    try:
        sim.ANN_DRIVER_MAX_BLOCKS = 4  # force the shuffle-fold path
        got_fold = sim._final_topk_ds(ds, 5)
        sim.ANN_DRIVER_MAX_BLOCKS = 10_000  # force the driver path
        got_driver = sim._final_topk_ds(ray.data.from_pandas(parts), 5)
    finally:
        sim.ANN_DRIVER_MAX_BLOCKS = old

    for got in (got_fold, got_driver):
        g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
        w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w)
