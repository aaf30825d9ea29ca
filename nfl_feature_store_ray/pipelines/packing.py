"""Training-set assembly operators: sequence packing (distributed prefix
sum) and eval-set decontamination (n-gram overlap) — standard large-scale
LLM data-pipeline steps absent from the reference (SURVEY §2.7 O5 class;
cf. the public GPT-3 appendix's 13-gram decontamination rule).

Scale shapes:
  pack_sequences   a GLOBAL running token total without any global sort:
                   the classic two-phase parallel scan. Pass 1 streams
                   per-range-bucket token sums to the driver (ONE tiny row
                   per bucket); the driver computes exclusive prefix
                   offsets (O(buckets)) and broadcasts them; pass 2 is one
                   range-bucket shuffle where each bucket adds its offset
                   to an in-bucket cumsum. The dense doc_id range IS the
                   order, so no sort-based all-to-all ever happens.
  decontaminate    eval sets are small by construction, so the eval
                   n-gram set is built once and broadcast (ray.put); the
                   corpus side is a single streaming map_batches with a
                   hash-set membership probe — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nfl_feature_store_ray.functions import textfuncs as tf
from nfl_feature_store_ray.sources.readers import read_table
from nfl_feature_store_ray.stages.bucketize import map_conv_buckets

PACK_BUDGET = 2048  # tokens per packed sequence
PACK_RANGE = 256    # doc_ids per scan bucket (dense-id range partition)


def _token_counts(df: pd.DataFrame) -> pd.DataFrame:
    low = df["text"].fillna("")
    nt = np.where(
        low.str.len().to_numpy() > 0, low.str.count(" ").to_numpy() + 1, 0
    ).astype(np.int64)
    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64"), "n_tokens": nt}
    )


def q_pack_sequences(sf_dir: str):
    """Greedy contiguous sequence packing: assign each document (in doc_id
    order) a pack_id and in-pack offset under a PACK_BUDGET token budget,
    via the two-phase distributed scan described in the module docstring."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # ---- pass 1: per-bucket token sums (streamed partials, tiny rows) ----
    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_counts(df)
        t["_rb"] = t["doc_id"] // PACK_RANGE
        g = t.groupby("_rb", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "s"})

    parts = docs.map_batches(bucket_sums, batch_format="pandas").to_pandas()
    totals = parts.groupby("_rb")["s"].sum().sort_index()
    # exclusive prefix offsets, broadcast as a plain dict (O(buckets))
    offsets = dict(zip(totals.index, np.concatenate([[0], totals.to_numpy().cumsum()[:-1]])))

    # ---- pass 2: one range-bucket shuffle; offset + in-range cumsum ----
    # a hash bucket may hold SEVERAL _rb ranges (hash collisions over the
    # range ids) — the cumsum must restart per range, each with its own
    # broadcast offset
    def pack(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for rb, g in group.groupby("_rb", sort=True):
            g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
            nt = g["n_tokens"].to_numpy()
            start = offsets[int(rb)] + nt.cumsum() - nt
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": g["doc_id"],
                        "n_tokens": g["n_tokens"],
                        "pack_id": (start // PACK_BUDGET).astype("int64"),
                        "pack_offset": (start % PACK_BUDGET).astype("int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    toks = docs.map_batches(_token_counts, batch_format="pandas")

    def add_rb(df: pd.DataFrame) -> pd.DataFrame:
        df["_rb"] = df["doc_id"] // PACK_RANGE
        return df

    toks = toks.map_batches(add_rb, batch_format="pandas")
    return map_conv_buckets(
        toks, pack, key="_rb", sort_cols=["doc_id"], num_buckets=16
    )


_NT = """CASE WHEN length(coalesce(text, '')) > 0
              THEN length(text) - length(replace(text, ' ', '')) + 1
              ELSE 0 END"""

SQL_PACK_SEQUENCES = f"""
WITH ws AS (SELECT doc_id, {_NT} AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
  FROM ws
)
SELECT doc_id, n_tokens,
       CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM c
"""


DECON_K = 13          # GPT-3 decontamination n-gram size (public appendix)
DECON_EVAL_MOD = 97   # docs with doc_id % 97 == 0 stand in for the eval set


def eval_gram_set(sf_dir: str, k: int = DECON_K, mod: int = DECON_EVAL_MOD):
    """Distinct k-grams of the (small) eval slice, collected to the driver.
    Bounded by construction: eval sets are fixed benchmark files, orders of
    magnitude smaller than the training corpus."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    import pyarrow as pa

    def grams(df: pd.DataFrame):
        ev = df[df["doc_id"] % mod == 0]
        _, flat = tf.shingle_flat(ev["text"].to_numpy(), k=k)
        # typed Arrow output: empty object columns confuse the block-size
        # estimator on batches holding no eval docs
        return pa.table({"g": pa.array(pd.unique(flat), type=pa.string())})

    out = docs.map_batches(grams, batch_format="pandas").to_pandas()
    return frozenset(out["g"])


def q_decontaminate(sf_dir: str):
    """Flag every TRAINING document that shares any DECON_K-gram with the
    eval slice. Eval grams broadcast once (ray.put); the corpus pass is a
    single shuffle-free map with a C-path hash-set membership probe."""
    import ray as _ray

    grams_ref = _ray.put(eval_gram_set(sf_dir))

    class Flag:
        def __init__(self):
            self.grams = _ray.get(grams_ref)  # once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            tr = df[df["doc_id"] % DECON_EVAL_MOD != 0].reset_index(drop=True)
            counts, flat = tf.shingle_flat(tr["text"].to_numpy(), k=DECON_K)
            hit = pd.Series(flat).isin(self.grams).to_numpy()
            ends = counts.cumsum()
            starts = ends - counts
            any_hit = np.zeros(len(tr), dtype=bool)
            nz = counts > 0
            if nz.any():
                csum = np.concatenate([[0], hit.cumsum()])
                any_hit[nz] = (csum[ends[nz]] - csum[starts[nz]]) > 0
            return pd.DataFrame(
                {"doc_id": tr["doc_id"].astype("int64"), "contaminated": any_hit}
            )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(Flag, batch_format="pandas", concurrency=(1, 4))


def _gram_expr(k: int) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len(w) >= {k} THEN "
        f"list_transform(generate_series(1, len(w) - {k - 1}), i -> {joined}) "
        "ELSE [] END"
    )


SQL_DECONTAMINATE = f"""
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
g AS (SELECT doc_id, {_gram_expr(DECON_K)} AS gs FROM ws),
ev AS (SELECT DISTINCT unnest(gs) AS eg FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0),
tr AS (SELECT doc_id, unnest(gs) AS tg FROM g WHERE doc_id % {DECON_EVAL_MOD} <> 0),
hits AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.tg = ev.eg)
SELECT g.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
WHERE g.doc_id % {DECON_EVAL_MOD} <> 0
"""

QUERIES = {
    "pack_sequences": q_pack_sequences,
    "decontaminate": q_decontaminate,
}

ORACLES = {
    "pack_sequences": SQL_PACK_SEQUENCES,
    "decontaminate": SQL_DECONTAMINATE,
}
