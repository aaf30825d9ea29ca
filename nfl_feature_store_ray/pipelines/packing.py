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
# NULL-group-key sentinel (never a valid lang code: NUL byte prefix) —
# pandas NaN group keys are dict-lookup-unsafe, SQL GROUP BY keeps NULL
_NULL_KEY = "\x00<null>"


def _token_counts(df: pd.DataFrame) -> pd.DataFrame:
    low = df["text"].fillna("")
    nt = np.where(
        low.str.len().to_numpy() > 0, low.str.count(" ").to_numpy() + 1, 0
    ).astype(np.int64)
    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64"), "n_tokens": nt}
    )


_PACK_SCHEMA = {
    "doc_id": "int64", "n_tokens": "int64", "pack_id": "int64",
    "pack_offset": "int64",
}


def pack_scan(toks):
    """Two-phase distributed prefix-sum packing over a ``(doc_id,
    n_tokens)`` dataset (see module docstring): pass 1 streams per-range
    partial sums to the driver (one tiny row per range), pass 2 is one
    range-keyed shuffle adding the broadcast exclusive offsets."""

    # ---- pass 1: per-range token sums (streamed partials, tiny rows) ----
    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        t = df.copy()
        t["_rb"] = t["doc_id"] // PACK_RANGE
        g = t.groupby("_rb", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "s"})

    parts = toks.map_batches(bucket_sums, batch_format="pandas").to_pandas()
    if parts.empty:
        # an empty upstream (e.g. nothing survives curation) loses its
        # schema through Ray's to_pandas (true even for typed Arrow
        # blocks) — return the schema-complete empty result as a plain
        # DataFrame (a valid query return type) instead of KeyError'ing
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in _PACK_SCHEMA.items()}
        )
    totals = parts.groupby("_rb")["s"].sum().sort_index()
    # exclusive prefix offsets, broadcast as a plain dict (O(ranges))
    offsets = dict(zip(totals.index, np.concatenate([[0], totals.to_numpy().cumsum()[:-1]])))

    # ---- pass 2: one range-keyed shuffle; offset + in-range cumsum ----
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

    def add_rb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = df["doc_id"] // PACK_RANGE
        return df

    return map_conv_buckets(
        toks.map_batches(add_rb, batch_format="pandas"), pack,
        key="_rb", sort_cols=["doc_id"], num_buckets=16,
    )


def q_pack_sequences(sf_dir: str):
    """Greedy contiguous sequence packing: assign each document (in doc_id
    order) a pack_id and in-pack offset under a PACK_BUDGET token budget,
    via the two-phase distributed scan described in the module docstring."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_scan(docs.map_batches(_token_counts, batch_format="pandas"))


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

# per-worker-process broadcast cache (shared helper: a bare per-batch
# ray.get re-unpickles the whole frozenset on every batch)
from nfl_feature_store_ray.functions.broadcast import cached_object_get as _cached_gram_get


def contamination_mask(texts: pd.Series, grams: frozenset) -> np.ndarray:
    """THE 13-gram contamination probe, shared by ``q_decontaminate`` and
    the curation composite (single source of truth): True where any
    DECON_K-gram of the doc appears in ``grams``."""
    counts, flat = tf.shingle_flat(texts.to_numpy(), k=DECON_K)
    hit = pd.Series(flat).isin(grams).to_numpy()
    ends = counts.cumsum()
    out = np.zeros(len(texts), dtype=bool)
    nz = counts > 0
    if nz.any():
        cs = np.concatenate([[0], hit.cumsum()])
        out[nz] = (cs[ends[nz]] - cs[(ends - counts)[nz]]) > 0
    return out


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

    # task-pool closure, not an actor pool: a fresh actor pool costs ~1s
    # spin-up per query invocation, while _cached_gram_get deserializes
    # the gram set ONCE per worker process (a bare per-batch ray.get would
    # re-unpickle the whole set every batch — plasma only zero-copies
    # numpy buffers, not pickled Python sets)
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        grams = _cached_gram_get(grams_ref)
        tr = df[df["doc_id"] % DECON_EVAL_MOD != 0].reset_index(drop=True)
        return pd.DataFrame(
            {"doc_id": tr["doc_id"].astype("int64"),
             "contaminated": contamination_mask(tr["text"], grams)}
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(flag, batch_format="pandas")


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


# ---------------------------------------------------------------------------
# END-TO-END CURATION COMPOSITE: quality filter -> decontamination ->
# exact dedup -> sequence packing, as ONE pipeline — the full assembly
# path a 100-TB training-data ingest runs, gated end to end.
# ---------------------------------------------------------------------------
def q_curate_corpus(sf_dir: str):
    """Curate the training corpus and pack the survivors:

      1. quality filter (quality_flags semantics: token bounds + dup-
         trigram cap) and 13-gram decontamination vs the eval slice —
         BOTH flags in one shuffle-free actor pass (eval grams broadcast)
      2. exact dedup among the ELIGIBLE docs (min-doc_id survivor per
         text) — one text-hash bucket shuffle
      3. sequence packing of survivors in doc_id order — the two-phase
         distributed scan (`pack_scan`)

    The survivor set is materialized between 2 and 3 because the scan
    needs two passes over it; it is (doc_id, n_tokens) only — 16 B/doc.
    At 100 TB, persist it via the partitioned-commit path instead and
    point `pack_scan` at the re-read (same shape, resumable)."""
    import ray as _ray

    grams_ref = _ray.put(eval_gram_set(sf_dir))

    # task-pool closure; BOTH filter decisions come from the shared
    # single-source helpers (quality_signals, contamination_mask), so the
    # composite can never drift from the individually-gated queries
    def eligible(df: pd.DataFrame) -> pd.DataFrame:
        from nfl_feature_store_ray.pipelines.text_analysis import quality_signals

        grams = _cached_gram_get(grams_ref)
        tr = df[df["doc_id"] % DECON_EVAL_MOD != 0].reset_index(drop=True)
        sig = quality_signals(tr["text"])
        ok = sig["keep"] & ~contamination_mask(tr["text"], grams)
        out = tr.loc[ok, ["doc_id", "text"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_tokens"] = sig["n_tokens"][ok]
        return out

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=8)
    elig = docs.map_batches(eligible, batch_format="pandas")

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = tf.hash61_array(df["text"].to_numpy())
        return df

    def survivors(group: pd.DataFrame) -> pd.DataFrame:
        # dropna=False mirrors q_dedup_exact: SQL keeps NULL text as one
        # group (currently unreachable here — QF_TOK_MIN excludes null
        # docs — but the stage must not silently diverge if reused)
        keep = (
            group.groupby("text", dropna=False)["doc_id"].transform("min")
            == group["doc_id"]
        )
        return group.loc[keep, ["doc_id", "n_tokens"]]

    surv = map_conv_buckets(
        elig.map_batches(add_hash, batch_format="pandas"), survivors,
        key="_h", sort_cols=["_h", "doc_id"],
    ).materialize()  # (doc_id, n_tokens) only; see docstring for 100-TB path

    return pack_scan(surv)


from nfl_feature_store_ray.pipelines.text_analysis import (  # noqa: E402
    QF_DUP_MAX as _QF_DUP_MAX,
    QF_TOK_MAX as _QF_TOK_MAX,
    QF_TOK_MIN as _QF_TOK_MIN,
)

SQL_CURATE_CORPUS = f"""
WITH ws AS (SELECT doc_id, text, lower(text) AS lt,
                   string_split(lower(text), ' ') AS w FROM documents),
tri AS (SELECT doc_id, lt, w, {_gram_expr(3)} AS t3 FROM ws),
qm AS (
  SELECT doc_id,
         CASE WHEN length(lt) > 0 THEN len(w) ELSE 0 END AS n_tokens,
         ROUND(CASE WHEN len(t3) > 0
                    THEN 1.0 - len(list_distinct(t3)) / CAST(len(t3) AS DOUBLE)
                    ELSE 0.0 END, 6) AS dup3
  FROM tri
),
g AS (SELECT doc_id, {_gram_expr(DECON_K)} AS gs FROM ws),
ev AS (SELECT DISTINCT unnest(gs) AS eg FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0),
trn AS (SELECT doc_id, unnest(gs) AS tg FROM g WHERE doc_id % {DECON_EVAL_MOD} <> 0),
hits AS (SELECT DISTINCT trn.doc_id FROM trn JOIN ev ON trn.tg = ev.eg),
elig AS (
  SELECT d.doc_id, d.text, qm.n_tokens
  FROM documents d
  JOIN qm ON qm.doc_id = d.doc_id
  LEFT JOIN hits ON hits.doc_id = d.doc_id
  WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    AND qm.n_tokens BETWEEN {_QF_TOK_MIN} AND {_QF_TOK_MAX}
    AND qm.dup3 <= {_QF_DUP_MAX}
    AND hits.doc_id IS NULL
),
surv AS (
  SELECT doc_id, n_tokens
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS mn FROM elig)
  WHERE doc_id = mn
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
  FROM surv
)
SELECT doc_id, n_tokens,
       CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM c
"""

QUERIES["curate_corpus"] = q_curate_corpus
ORACLES["curate_corpus"] = SQL_CURATE_CORPUS


# ---------------------------------------------------------------------------
# Concatenated-corpus offset index, PER LANGUAGE — the byte/char offset map
# a packed-corpus loader needs (where does doc d start in lang l's
# concatenation?). Extends the pack_scan two-phase prefix sum to GROUPED
# scans: pass 1 ships one (range, lang) partial sum row per range bucket,
# the driver computes per-lang exclusive carries in range order
# (O(ranges x langs), langs bounded), pass 2 is the same single
# range-keyed shuffle with an in-bucket per-lang cumsum. No global sort,
# no per-lang shuffle — the dense doc_id range IS the order.
# ---------------------------------------------------------------------------
def q_doc_offsets(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             # NULL lang is a real partition in the SQL oracle (PARTITION BY
             # keeps a NULL group); a sentinel keeps it through the pandas
             # groupbys / the offsets dict (NaN keys are lookup-unsafe) and
             # is restored to NULL at the output projection (ADVICE r04).
             "lang": df["lang"].fillna(_NULL_KEY),
             # +1: the '\n' separator each doc contributes to the stream
             "n_chars": (df["text"].fillna("").str.len() + 1).astype("int64")}
        )

    toks = docs.map_batches(lens, batch_format="pandas")

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        t = df.copy()
        t["_rb"] = t["doc_id"] // PACK_RANGE
        return t.groupby(["_rb", "lang"], as_index=False)["n_chars"].sum()

    parts = toks.map_batches(bucket_sums, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "lang": pd.Series(dtype=object),
             "n_chars": pd.Series(dtype="int64"), "offset": pd.Series(dtype="int64")}
        )
    totals = (
        parts.groupby(["_rb", "lang"], as_index=False)["n_chars"].sum()
        .sort_values(["lang", "_rb"], kind="mergesort")
    )
    csum = totals.groupby("lang")["n_chars"].cumsum() - totals["n_chars"]
    offsets = {
        (int(rb), lg): int(off)
        for rb, lg, off in zip(totals["_rb"], totals["lang"], csum)
    }

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (rb, lg), g in group.groupby(["_rb", "lang"], sort=True):
            g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
            n = g["n_chars"].to_numpy()
            start = offsets[(int(rb), lg)] + n.cumsum() - n
            outs.append(pd.DataFrame(
                {"doc_id": g["doc_id"], "lang": lg,
                 "n_chars": g["n_chars"], "offset": start.astype("int64")}
            ))
        return pd.concat(outs, ignore_index=True)

    def add_rb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = df["doc_id"] // PACK_RANGE
        return df

    def project(d: pd.DataFrame) -> pd.DataFrame:
        d = d[["doc_id", "lang", "n_chars", "offset"]].copy()
        d["lang"] = d["lang"].where(d["lang"] != _NULL_KEY, None)
        return d

    return map_conv_buckets(
        toks.map_batches(add_rb, batch_format="pandas"), scan,
        key="_rb", sort_cols=["doc_id"], num_buckets=16,
    ).map_batches(project, batch_format="pandas")


SQL_DOC_OFFSETS = """
WITH l AS (
  SELECT doc_id, lang,
         CAST(length(coalesce(text, '')) + 1 AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS offset
FROM l
"""

QUERIES["doc_offsets"] = q_doc_offsets
ORACLES["doc_offsets"] = SQL_DOC_OFFSETS


# ---------------------------------------------------------------------------
# Cross-document duplicated-span counter — per doc, how many of its
# DISTINCT 13-grams appear in at least one OTHER document (the intra-
# corpus repeated-span signal behind substring-level train-set dedup;
# cf. the public "Deduplicating Training Data" recipe). Scale shape: the
# count-only posting-list pattern — distinct (gram, doc) pairs, ONE
# gram-keyed shuffle where each gram's posting list is COUNTED (never
# paired, so a stop-gram's hot list costs O(list), not O(list^2)), then
# one doc-keyed partial-sum shuffle for the per-doc rollup.
# ---------------------------------------------------------------------------
def q_dup_spans(sf_dir: str):
    docs = read_table(
        sf_dir, "documents", columns=["doc_id", "text"]
    )

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        counts, flat = tf.shingle_flat(df["text"].to_numpy(), k=DECON_K)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        return pd.DataFrame({"doc_id": doc, "gr": flat}).drop_duplicates()

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["gr", "doc_id"])
        nd = d.groupby("gr", sort=False)["doc_id"].transform("size")
        dup = d[nd.to_numpy() >= 2]
        out = d.groupby("doc_id", as_index=False).agg(n_grams=("gr", "size"))
        od = dup.groupby("doc_id", as_index=False).agg(n_dup_grams=("gr", "size"))
        m = out.merge(od, on="doc_id", how="left")
        m["n_dup_grams"] = m["n_dup_grams"].fillna(0).astype("int64")
        m["n_grams"] = m["n_grams"].astype("int64")
        return m

    parts = map_conv_buckets(
        docs.map_batches(grams, batch_format="pandas"), per_gram,
        key="gr", sort_cols=["gr", "doc_id"], num_buckets=16,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)[["n_grams", "n_dup_grams"]].sum()
        out["n_grams"] = out["n_grams"].astype("int64")
        out["n_dup_grams"] = out["n_dup_grams"].astype("int64")
        return out

    return map_conv_buckets(parts, final, key="doc_id",
                            sort_cols=["doc_id"], num_buckets=8)


SQL_DUP_SPANS = f"""
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
g AS (SELECT doc_id, {_gram_expr(DECON_K)} AS gs FROM ws),
d AS (SELECT DISTINCT doc_id, unnest(gs) AS gr FROM g),
c AS (SELECT gr, COUNT(*) AS nd FROM d GROUP BY gr)
SELECT d.doc_id,
       COUNT(*) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE c.nd >= 2) AS BIGINT) AS n_dup_grams
FROM d JOIN c USING (gr)
GROUP BY d.doc_id
"""

QUERIES["dup_spans"] = q_dup_spans
ORACLES["dup_spans"] = SQL_DUP_SPANS
