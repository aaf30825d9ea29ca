"""Deduplication operator family over the ``documents`` table.

Large-scale training-data operators (not present in the reference, which
has only exact `drop_duplicates`, SURVEY §2.7 O2/O5 — the rest are the
standard web-scale dedup stack):

  dedup_exact           hash-partition + per-group min-key survivor [oracle]
  dedup_ngram_jaccard   exact word-3-gram Jaccard pairs via shingle
                        inverted index (self-join on shingle)       [oracle]
  dedup_minhash_lsh     MinHash(128) + LSH(32 bands x 4 rows) candidates,
                        verified by true Jaccard — approximate recall,
                        exact precision                           [no oracle]
  dedup_simhash         64-bit SimHash + pigeonhole band blocking for
                        hamming <= HAM_T pairs                    [no oracle]

Scale notes: every stage is map_batches + one keyed shuffle. The shingle
inverted index is the scale hazard (hot shingles); the LSH path exists
precisely because the exact self-join blows up at 100 TB — band buckets
bound the join to near-duplicate clusters. Hot-bucket salting: buckets
larger than MAX_BUCKET are dropped with a log line (standard LSH
stop-shingle handling), never silently.
"""

from __future__ import annotations

import numpy as np
from nfl_feature_store_ray.functions.rounding import round_half_away
import pandas as pd
from nfl_feature_store_ray.functions import textfuncs as tf
from nfl_feature_store_ray.sources.readers import read_table
from nfl_feature_store_ray.stages.bucketize import map_conv_buckets

JACCARD_T = 0.6
HAM_T = 3
NUM_PERM = 128
BANDS = 32
MAX_BUCKET = 200  # LSH bucket cap (stop-shingle analogue)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def q_dedup_exact(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df["_h"] = [tf.hash64(t) for t in df["text"]]
        return df

    hashed = docs.map_batches(add_hash, batch_format="pandas")

    def survivors(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return g[["doc_id", "n_copies"]]

    return map_conv_buckets(hashed, survivors, key="_h", sort_cols=["_h", "doc_id"])


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM documents GROUP BY text
"""


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted shingle index)
# ---------------------------------------------------------------------------
def _explode_shingles(df: pd.DataFrame) -> pd.DataFrame:
    rows_doc, rows_sh, rows_n = [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        ss = tf.shingle_set(text, k=3)
        n = len(ss)
        for s in ss:
            rows_doc.append(doc_id)
            rows_sh.append(tf.hash64(s))
            rows_n.append(n)
    return pd.DataFrame(
        {"doc_id": np.asarray(rows_doc, dtype=np.int64),
         "sh": np.asarray(rows_sh, dtype=np.int64),
         "n_sh": np.asarray(rows_n, dtype=np.int64)}
    )


def _pairs_from_index(group: pd.DataFrame) -> pd.DataFrame:
    """Self-join the bucket's inverted index into candidate pair rows.

    ONE vectorized hash self-join on the shingle column (not a Python loop
    over posting lists); singleton shingles are dropped first, so join
    fan-out is bounded by duplicate-shingle frequency."""
    vc = group["sh"].value_counts()
    hot = vc[vc >= 2].index
    g = group[group["sh"].isin(hot)]
    if len(g) == 0:
        return pd.DataFrame(
            {"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64"),
             "n_sh_a": pd.Series(dtype="int64"), "n_sh_b": pd.Series(dtype="int64"),
             "shared": pd.Series(dtype="int64")}
        )
    m = g.merge(g, on="sh", suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    out = m.groupby(["doc_id_a", "doc_id_b", "n_sh_a", "n_sh_b"], as_index=False).size()
    return out.rename(columns={"size": "shared"})


def _finish_jaccard(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    union = df["n_sh_a"] + df["n_sh_b"] - df["shared"]
    df["jaccard"] = round_half_away(df["shared"] / union.astype("float64"), 6)
    df = df[df["jaccard"] >= threshold]
    return df[["doc_id_a", "doc_id_b", "jaccard"]]


def q_dedup_ngram_jaccard(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    exploded = docs.map_batches(_explode_shingles, batch_format="pandas")
    # shuffle on shingle hash; build pairs per posting list
    pair_partials = map_conv_buckets(
        exploded, _pairs_from_index, key="sh", sort_cols=["sh", "doc_id"]
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(
            ["doc_id_a", "doc_id_b", "n_sh_a", "n_sh_b"], as_index=False
        )["shared"].sum()
        return _finish_jaccard(g, JACCARD_T)

    return map_conv_buckets(
        pair_partials,
        finish,
        key=["doc_id_a", "doc_id_b"],
        sort_cols=["doc_id_a", "doc_id_b"],
        num_buckets=32,
    )


SQL_DEDUP_NGRAM = f"""
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       ROUND(shared / CAST(sa.n + sb.n - shared AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE ROUND(shared / CAST(sa.n + sb.n - shared AS DOUBLE), 6) >= {JACCARD_T}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate recall, exact verification) — no SQL oracle
# ---------------------------------------------------------------------------
class _MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self):
        self.a, self.b = tf.minhash_params(NUM_PERM)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hash_lists = [
            np.array([tf.hash31(s) for s in tf.shingle_set(t, 3)], dtype=np.uint64)
            for t in df["text"]
        ]
        sigs = tf.minhash_signature_matrix(hash_lists, self.a, self.b)
        rows_doc, rows_band, rows_key, rows_n = [], [], [], []
        for doc_id, sig, hl in zip(df["doc_id"], sigs, hash_lists):
            for band_i, key in enumerate(tf.band_keys(sig, BANDS)):
                rows_doc.append(doc_id)
                rows_band.append(band_i)
                rows_key.append(key)
                rows_n.append(len(hl))
        return pd.DataFrame(
            {"doc_id": np.asarray(rows_doc, dtype=np.int64),
             "band": np.asarray(rows_band, dtype=np.int32),
             "key": np.asarray(rows_key, dtype=np.int64),
             "n_sh": np.asarray(rows_n, dtype=np.int64)}
        )


def q_dedup_minhash_lsh(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    banded = docs.map_batches(_MinHasher, batch_format="pandas", concurrency=(1, 4))

    def add_bandkey(df: pd.DataFrame) -> pd.DataFrame:
        df["bk"] = df["band"].astype("int64") * (1 << 40) ^ df["key"]
        return df

    banded = banded.map_batches(add_bandkey, batch_format="pandas")

    def candidates(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in group.groupby("bk", sort=False):
            if len(g) < 2 or len(g) > MAX_BUCKET:
                continue
            g = g.drop_duplicates("doc_id")
            m = g.merge(g, on="bk", suffixes=("_a", "_b"))
            m = m[m["doc_id_a"] < m["doc_id_b"]]
            outs.append(m[["doc_id_a", "doc_id_b"]])
        if not outs:
            return pd.DataFrame(
                {"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    cand = map_conv_buckets(banded, candidates, key="bk", sort_cols=["bk", "doc_id"])

    # verification: join candidate pairs back to shingle sets and compute
    # exact Jaccard. The candidate set is small by construction (near-dup
    # clusters only), so cross-band dedup happens on the driver frame we
    # materialize for verification anyway — no extra shuffle.
    cand_df = cand.to_pandas().drop_duplicates(["doc_id_a", "doc_id_b"])
    if len(cand_df) == 0:
        return pd.DataFrame(
            {"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    needed = set(cand_df["doc_id_a"]) | set(cand_df["doc_id_b"])

    def shingles_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"].isin(needed)]
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "sh_set": [frozenset(tf.shingle_set(t, 3)) for t in df["text"]]}
        )

    sets = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(shingles_of, batch_format="pandas")
        .to_pandas()
    )
    lookup = dict(zip(sets["doc_id"], sets["sh_set"]))
    jac = []
    for a_id, b_id in zip(cand_df["doc_id_a"], cand_df["doc_id_b"]):
        sa, sb = lookup[a_id], lookup[b_id]
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    cand_df["jaccard"] = round_half_away(jac, 6)
    out = cand_df[cand_df["jaccard"] >= JACCARD_T].reset_index(drop=True)
    return out[["doc_id_a", "doc_id_b", "jaccard"]]


# ---------------------------------------------------------------------------
# SimHash near-dup pairs — no SQL oracle
# ---------------------------------------------------------------------------
def q_dedup_simhash(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "simhash": [tf.simhash64(tf.token_split(t.lower())) for t in df["text"]]}
        )

    sigs = docs.map_batches(sim, batch_format="pandas")

    # pigeonhole: hamming <= HAM_T means at least one of HAM_T+1 segments
    # matches exactly — block on each 16-bit segment
    def explode_segments(df: pd.DataFrame) -> pd.DataFrame:
        segs = HAM_T + 1
        width = 64 // segs
        rows = []
        for doc_id, h in zip(df["doc_id"], df["simhash"]):
            for s in range(segs):
                seg_val = (h >> (s * width)) & ((1 << width) - 1)
                rows.append((doc_id, s * (1 << width) + seg_val, h))
        return pd.DataFrame(rows, columns=["doc_id", "seg_key", "simhash"])

    exploded = sigs.map_batches(explode_segments, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in group.groupby("seg_key", sort=False):
            if len(g) < 2 or len(g) > MAX_BUCKET:
                continue
            g = g.drop_duplicates("doc_id")
            m = g.merge(g, on="seg_key", suffixes=("_a", "_b"))
            m = m[m["doc_id_a"] < m["doc_id_b"]]
            ham = [
                tf.hamming64(int(x), int(y))
                for x, y in zip(m["simhash_a"], m["simhash_b"])
            ]
            m = m.assign(hamming=np.asarray(ham, dtype="int64"))
            m = m[m["hamming"] <= HAM_T]
            outs.append(m[["doc_id_a", "doc_id_b", "hamming"]])
        if not outs:
            return pd.DataFrame(
                {"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    cand = map_conv_buckets(exploded, pairs, key="seg_key", sort_cols=["seg_key", "doc_id"])
    # a pair can be found via several segments — distinct, one bucket shuffle
    return map_conv_buckets(
        cand,
        lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]),
        key=["doc_id_a", "doc_id_b"],
        sort_cols=["doc_id_a", "doc_id_b"],
        num_buckets=16,
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
}

ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM,
}


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------
COS_T = 0.4  # synthetic embeddings: max pairwise cos ~0.51; 0.4 yields a small true pair set


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (cos >= COS_T, a < b).

    Exact at this scale: the (small) normalized matrix is broadcast via
    ray.put once; each batch computes one (batch x all) matmul and emits
    its above-threshold pairs. The 100-TB path replaces the broadcast with
    IVF-cell blocking (similarity.q_ann_ivf's quantizer) so candidate
    pairs stay cell-local.
    """
    import ray as _ray

    from nfl_feature_store_ray.pipelines.similarity import _norm_rows

    emb_df = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    all_ids = emb_df["vec_id"].to_numpy(dtype=np.int64)
    all_m = _norm_rows(np.stack(emb_df["embedding"].to_numpy()).astype(np.float64))
    ids_ref, mat_ref = _ray.put(all_ids), _ray.put(all_m)

    class PairFinder:
        def __init__(self):
            self.ids = _ray.get(ids_ref)
            self.m = _ray.get(mat_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _norm_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            vids = df["vec_id"].to_numpy(dtype=np.int64)
            sims = round_half_away(vecs @ self.m.T, 6)  # (batch, all)
            bi, aj = np.nonzero(sims >= COS_T)
            a = vids[bi]
            b = self.ids[aj]
            keep = a < b
            return pd.DataFrame(
                {
                    "doc_id_a": pd.Series(a[keep], dtype="int64"),
                    "doc_id_b": pd.Series(b[keep], dtype="int64"),
                    "cos_sim": pd.Series(sims[bi, aj][keep], dtype="float64"),
                }
            )

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return emb.map_batches(PairFinder, batch_format="pandas", concurrency=(1, 4))


SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS doc_id_a, b.vec_id AS doc_id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= {COS_T}
"""

QUERIES["dedup_embedding"] = q_dedup_embedding
ORACLES["dedup_embedding"] = SQL_DEDUP_EMBEDDING
