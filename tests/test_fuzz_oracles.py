"""Adversarial-corpus oracle fuzz: the shipped testdata never exercises
NULL text, empty strings, single-token docs, repeated whitespace, unicode,
or cross-language duplicate texts — this seeded nasty corpus does, and
every document-family query must STILL match its DuckDB oracle on it.

Round-3 catches: NULL-text semantics divergence in lang_id/token_counts
(engine: null ≡ empty doc; oracle now coalesces to match) and dedup_exact
dropping the NULL-text duplicate group (pandas groupby dropna default vs
SQL GROUP BY keeping NULLs)."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

FUZZ_DIR = "/tmp/nfl_fs_fuzz_test"

DOC_QUERIES = [
    "text_stats", "lang_id", "token_counts", "quantile_tokens", "top_tokens",
    "quality_flags", "sample_docs", "sample_stratified", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_clusters", "pack_sequences",
    "decontaminate", "curate_corpus", "media_stats",
]


@pytest.fixture(scope="module")
def fuzz_dir():
    rng = np.random.default_rng(123)
    vocab = [f"w{i}" for i in range(150)] + ["the", "a", "of", "é", "naïve", "的"]
    texts = []
    for _ in range(300):
        r = rng.random()
        if r < 0.03:
            texts.append(None)
        elif r < 0.06:
            texts.append("")
        elif r < 0.09:
            texts.append("one")
        elif r < 0.12:
            texts.append("  double  spaces ")
        else:
            texts.append(
                " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab),
                                                             int(rng.integers(1, 70))))
            )
    for i in range(290, 300):  # exact duplicate texts under different ids
        texts[i] = texts[i - 20]
    df = pd.DataFrame({"doc_id": range(300), "text": texts})
    df["lang"] = np.asarray(["en", "de", "es", "fr", "zh"], object)[
        rng.integers(0, 5, 300)
    ]
    df["source"] = "fuzz"
    df["n_chars"] = df["text"].str.len().fillna(0).astype("int64")
    shutil.rmtree(FUZZ_DIR, ignore_errors=True)
    os.makedirs(FUZZ_DIR)
    df.to_parquet(os.path.join(FUZZ_DIR, "documents.parquet"), index=False)
    yield FUZZ_DIR


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_fuzz_query_matches_oracle(name, fuzz_dir):
    import __ray_entry__ as e

    r = e.queries()[name](fuzz_dir)
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fuzz_dir}/documents.parquet')"
    )
    s = con.execute(e.oracle_sql()[name]).df()
    assert len(r) == len(s), f"{name}: rows {len(r)} != {len(s)}"
    cols = sorted(r.columns)
    assert cols == sorted(s.columns), name
    rr, ss = r[cols].copy(), s[cols].copy()
    for c in cols:
        if rr[c].dtype.kind in "fc" or ss[c].dtype.kind in "fc":
            rr[c] = rr[c].astype(float).round(6)
            ss[c] = ss[c].astype(float).round(6)
    a = np.sort(rr.astype(str).agg("|".join, axis=1).to_numpy())
    b = np.sort(ss.astype(str).agg("|".join, axis=1).to_numpy())
    assert (a == b).all(), f"{name}: values differ"
