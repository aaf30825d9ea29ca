"""Stress the DISTRIBUTED connected-components path at its boundary
(r03 verdict #7): 50k-doc salted corpus (10 near-dup replicas per sf0.1
source doc -> ~225k-pair clique graph), run q_dedup_clusters twice —
driver union-find fast-path vs CC_DRIVER_MAX_EDGES=0 (forces the BSP
hash-min label-propagation rounds) — assert identical cluster tables and
report rounds-to-convergence + wall for BASELINE.md.

Usage: python scripts/stress_cc_distributed.py
"""
import os
import shutil
import time
import warnings

warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd
import ray

STRESS_DIR = "/tmp/nfl_fs_cc_stress"


def build_corpus() -> str:
    src = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    reps = []
    for i in range(10):
        r = src.copy()
        r["doc_id"] = r["doc_id"].to_numpy() * 10 + i
        # replica i tweaks the tail so replicas stay near-dup (high
        # shingle Jaccard) but not byte-identical
        r["text"] = r["text"].fillna("") + f" rev{i}"
        reps.append(r)
    docs = pd.concat(reps, ignore_index=True)
    shutil.rmtree(STRESS_DIR, ignore_errors=True)
    os.makedirs(STRESS_DIR)
    docs.to_parquet(os.path.join(STRESS_DIR, "documents.parquet"), index=False)
    return STRESS_DIR


def run(tag: str) -> pd.DataFrame:
    import nfl_feature_store_ray.pipelines.dedup as dd

    t0 = time.time()
    out = dd.q_dedup_clusters(STRESS_DIR)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    wall = time.time() - t0
    print(f"{tag}: wall={wall:.1f}s rows={len(df)} "
          f"clusters={df['cluster_id'].nunique()} rounds={dd.CC_LAST_ROUNDS}")
    return df.sort_values("doc_id").reset_index(drop=True)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    build_corpus()
    os.environ.pop("CC_DRIVER_MAX_EDGES", None)
    fast = run("driver-fast-path")
    os.environ["CC_DRIVER_MAX_EDGES"] = "0"
    dist = run("distributed-BSP")
    os.environ.pop("CC_DRIVER_MAX_EDGES", None)
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)
    print("cluster tables IDENTICAL across paths")
    ray.shutdown()
