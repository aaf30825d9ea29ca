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
    "decontaminate", "curate_corpus", "media_stats", "oov_rate", "tfidf_terms",
    "hist_tokens", "lm_commonness", "redact_pii", "chunk_docs", "skew_tokens",
    "dedup_edit_distance", "media_dedup", "cooccurrence", "graph_triangles",
    "vocab_overlap", "top_bigrams", "pagerank", "posting_lists", "typo_stats",
    "doc_offsets", "source_overlap", "sample_temperature", "dup_spans",
    "sketch_cms_bounds", "sketch_mg_heavy",
    # round 5: planted-twin contracts for the approximate dedup family
    "minhash_twin_pairs", "simhash_twin_pairs", "fingerprint_twins",
]


@pytest.fixture(scope="module")
def fuzz_dir():
    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "123")))
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
    # several sources so the cross-source ops (vocab_overlap, stratified
    # sampling) exercise non-trivial pair/strata structure
    df["source"] = np.asarray(["fa", "fb", "fc"], object)[rng.integers(0, 3, 300)]
    # NULL group keys (round 5, from ADVICE): SQL GROUP BY / PARTITION BY
    # keep a NULL group, pandas groupby drops it by default — every
    # lang/source-grouped query must agree with its oracle on these rows
    df.loc[rng.random(300) < 0.04, "lang"] = None
    df.loc[rng.random(300) < 0.04, "source"] = None
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


# --------------------------------------------------------------------------
# adversarial EVENTS corpus: exact ts ties, single-event users, >24h session
# breaks, malformed props ('', '{}', 'notjson'), event types outside the
# role mapping — the transcript-family equivalent of the documents fuzz.
# Round-3 catch: parse_props' oracle CAST('' AS INTEGER) on no-match props
# (DuckDB regexp_extract returns '' not NULL).
# --------------------------------------------------------------------------
EVENTS_FUZZ_DIR = "/tmp/nfl_fs_fuzz_events_test"

EVENT_QUERIES = [
    "w_lag_gap", "w_rolling", "w_session_avg", "w_rank_composite",
    "w_densify_seeded", "w_asof_checkpoint", "w_phase_windows", "wide_slice",
    "w_sliding_window", "w_sliding_distinct", "w_tumbling", "w_label_split", "session_stats",
    "resume_manifest", "w_rolling_streaming", "w_incremental_append",
    "parse_props", "pair_join",
    "agg_career", "w_turn_overlap", "w_novelty", "w_rolling_median",
    "agg_variance", "w_zscore_day", "role_transitions",
    "w_cummax", "w_percent_rank_day", "w_expanding_corr", "w_streak",
    "w_asof_forward", "asof_tolerance", "w_ntile_day", "w_conv_text",
    "rollup_day_role", "percentile_day", "clean_text", "w_expanding_distinct",
    "set_ops_convs", "w_mad_day", "w_cume_dist_day", "topk_per_day", "w_first_value",
    "agg_weighted_day", "w_lag_k", "w_hopping", "cube_day_role",
    "w_response_latency", "w_share_day", "w_pattern_count",
    "w_quartile_bucket", "dedup_consecutive", "agg_hour_profile", "agg_tool_set",
    "w_session_funnel", "split_convs",
    "w_rolling_mode", "asof_nearest", "day_concentration", "cohort_retention",
    "topk_ties_day", "max_concurrency", "json_props", "w_late_events",
    "w_groups_frame", "target_encode", "w_time_decay_dyadic",
    "winsorize_day", "minmax_day", "w_rolling_grid7",
    "agg_gap_profile", "w_forward_sum_30m", "w_chained_subrange",
    "sketch_dd_bounds",
]


@pytest.fixture(scope="module")
def events_fuzz_dir():
    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "77")) + 1)
    rows, eid = [], 0
    base = pd.Timestamp("2024-02-01")
    types = ["click", "view", "purchase", "signup", "error", "search", "refund"]
    for u in range(40):
        n = 1 if u % 13 == 0 else int(rng.integers(2, 60))
        t = base + pd.Timedelta(minutes=int(rng.integers(0, 5000)))
        for k in range(n):
            r = rng.random()
            if r < 0.15 and k > 0:
                dt = pd.Timedelta(0)          # exact ts tie
            elif r < 0.25:
                dt = pd.Timedelta(hours=30)   # session break
            else:
                dt = pd.Timedelta(seconds=int(rng.integers(1, 400)))
            t = t + dt
            pr = rng.random()
            props = (
                '{"k": %d}' % int(rng.integers(0, 99)) if pr < 0.85
                else ("" if pr < 0.9 else ("{}" if pr < 0.95 else "notjson"))
            )
            rows.append((eid, t, u, types[int(rng.integers(0, len(types)))],
                         float(np.round(rng.random() * 300, 2)), props))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                     "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    shutil.rmtree(EVENTS_FUZZ_DIR, ignore_errors=True)
    os.makedirs(EVENTS_FUZZ_DIR)
    ev.to_parquet(os.path.join(EVENTS_FUZZ_DIR, "events.parquet"), index=False)
    yield EVENTS_FUZZ_DIR


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_fuzz_query_matches_oracle(name, events_fuzz_dir):
    import __ray_entry__ as e

    r = e.queries()[name](events_fuzz_dir)
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{events_fuzz_dir}/events.parquet')"
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
        if rr[c].dtype.kind == "M":
            rr[c] = rr[c].astype("datetime64[us]")
        if ss[c].dtype.kind == "M":
            ss[c] = ss[c].astype("datetime64[us]")
    a = np.sort(rr.astype(str).agg("|".join, axis=1).to_numpy())
    b = np.sort(ss.astype(str).agg("|".join, axis=1).to_numpy())
    assert (a == b).all(), f"{name}: values differ"


# --------------------------------------------------------------------------
# adversarial EMBEDDINGS corpus: zero vector (cosine undefined — engine
# convention 0.0, oracle pinned via CASE), exact/scaled duplicates
# (cos = 1), antipodal pair (cos = -1).
# --------------------------------------------------------------------------
EMB_FUZZ_DIR = "/tmp/nfl_fs_fuzz_emb_test"


@pytest.fixture(scope="module")
def emb_fuzz_dir():
    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "55")) + 2)
    vecs = rng.normal(size=(200, 64))
    vecs[7] = 0.0
    vecs[23] = vecs[11]
    vecs[45] = vecs[12] * 3.0
    vecs[60] = -vecs[13]
    df = pd.DataFrame(
        {"vec_id": range(200),
         "embedding": [v.astype(np.float32).tolist() for v in vecs],
         "label": rng.integers(0, 4, 200).astype("int32")}
    )
    shutil.rmtree(EMB_FUZZ_DIR, ignore_errors=True)
    os.makedirs(EMB_FUZZ_DIR)
    df.to_parquet(os.path.join(EMB_FUZZ_DIR, "embeddings.parquet"), index=False)
    yield EMB_FUZZ_DIR


@pytest.mark.parametrize("name", ["ann_cosine_topk", "dedup_embedding", "centroid_label",
                                  "ann_lsh_self_match", "kmeans_twin_consistency",
                                  "pq_twin_codes", "ann_ivf_self_match"])
def test_emb_fuzz_query_matches_oracle(name, emb_fuzz_dir):
    import __ray_entry__ as e

    r = e.queries()[name](emb_fuzz_dir)
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb_fuzz_dir}/embeddings.parquet')"
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


# --------------------------------------------------------------------------
# NULL-value EVENTS corpus (round 4, from ADVICE): same shape as the events
# fuzz but ~8% of `value` is NULL — the hazard class where an unmasked
# NaN->int64 cents cast wraps to INT64_MIN and poisons a group sum, and
# where all-NULL (day, conv) groups must keep SQL's NULL-propagation
# (SUM -> NULL, NULLS LAST ordering, NULL rank ties). Queries join this
# list as they are NULL-hardened; the remaining value-window kernels
# (EWMA/rolling etc.) document value-non-null as a contract instead.
# --------------------------------------------------------------------------
NULL_EVENTS_FUZZ_DIR = "/tmp/nfl_fs_fuzz_nullval_test"

NULL_VALUE_QUERIES = [
    "w_rank_day", "w_ntile_day", "w_cume_dist_day", "topk_per_day",
    "topk_ties_day", "w_percent_rank_day", "w_zscore_day", "w_share_day",
    "w_quartile_bucket", "day_concentration", "w_rank_composite",
    "agg_weighted_day", "w_hopping", "agg_hour_profile", "w_groups_frame",
    "target_encode", "session_stats",
    "percentile_day", "w_mad_day", "w_first_value", "w_lag_k",
    "w_time_decay_dyadic",
    # verified NULL-clean by the round-4 full-registry sweep (value NULLs
    # never reach an int cast / their pandas kernels already share SQL's
    # NULL-skip semantics)
    "w_lag_gap", "w_rolling", "w_sliding_distinct", "w_label_split",
    "resume_manifest", "parse_props", "w_turn_overlap", "w_novelty",
    "w_rolling_median", "role_transitions", "w_cummax", "w_expanding_corr",
    "w_streak", "w_conv_text", "rollup_day_role", "clean_text",
    "w_expanding_distinct", "set_ops_convs", "cube_day_role",
    "w_response_latency", "w_pattern_count", "dedup_consecutive",
    "agg_tool_set", "w_session_funnel", "split_convs", "w_rolling_mode",
    "cohort_retention", "max_concurrency", "json_props", "w_late_events",
    # all-NULL-group semantics fixed in round 4 (min_count=1 partials /
    # nn counters; SQL SUM -> NULL preserved through carry/as-of/ranking)
    "agg_variance", "w_tumbling", "w_densify", "w_densify_seeded",
    "pair_join", "agg_career", "topk_convs", "w_asof_forward",
    "asof_tolerance", "asof_nearest", "asof_daily",
    "w_sliding_window", "w_asof_checkpoint",
    "winsorize_day", "minmax_day", "w_rolling_grid7",
    "agg_gap_profile", "w_forward_sum_30m",
    # round 5: the flagship expanding/EWMA/session window kernels now skip
    # NULLs like SQL AVG/SUM (pandas + polars + streaming paths, see
    # PARITY.md "Round-5 NULL-value window semantics")
    "w_ewma", "w_expanding", "w_session_avg", "w_phase_windows",
    "wide_slice", "w_rolling_streaming", "w_incremental_append",
    # round 5: the sub-range chained engine shares those kernels' NULL
    # semantics (streaming registers skip NULLs identically); the DD
    # bound query's value > 0 filter drops NULLs like the SQL WHERE
    "w_chained_subrange", "sketch_dd_bounds",
]


@pytest.fixture(scope="module")
def null_events_fuzz_dir():
    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "991")) + 3)
    rows, eid = [], 0
    base = pd.Timestamp("2024-05-01")
    types = ["click", "view", "purchase", "signup", "error", "search", "refund"]
    for u in range(40):
        # u % 11 == 0 -> single-event conversations; combined with the 8%
        # NULL rate these yield genuine all-NULL (day, conv) groups
        n = 1 if u % 11 == 0 else int(rng.integers(2, 50))
        t = base + pd.Timedelta(minutes=int(rng.integers(0, 5000)))
        for k in range(n):
            r = rng.random()
            if r < 0.15 and k > 0:
                dt = pd.Timedelta(0)
            elif r < 0.25:
                dt = pd.Timedelta(hours=30)
            else:
                dt = pd.Timedelta(seconds=int(rng.integers(1, 400)))
            t = t + dt
            v = None if rng.random() < 0.08 else float(np.round(rng.random() * 300, 2))
            # a few conversations are ENTIRELY null-valued
            if u % 17 == 0:
                v = None
            rows.append((eid, t, u, types[int(rng.integers(0, len(types)))],
                         v, '{"k": %d}' % int(rng.integers(0, 99))))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                     "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = ev["value"].astype("float64")
    shutil.rmtree(NULL_EVENTS_FUZZ_DIR, ignore_errors=True)
    os.makedirs(NULL_EVENTS_FUZZ_DIR)
    ev.to_parquet(os.path.join(NULL_EVENTS_FUZZ_DIR, "events.parquet"), index=False)
    yield NULL_EVENTS_FUZZ_DIR


@pytest.mark.parametrize("name", NULL_VALUE_QUERIES)
def test_null_value_fuzz_query_matches_oracle(name, null_events_fuzz_dir):
    import __ray_entry__ as e

    r = e.queries()[name](null_events_fuzz_dir)
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_fuzz_dir}/events.parquet')"
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
        if rr[c].dtype.kind == "M":
            rr[c] = rr[c].astype("datetime64[us]")
        if ss[c].dtype.kind == "M":
            ss[c] = ss[c].astype("datetime64[us]")
    a = np.sort(rr.astype(str).agg("|".join, axis=1).to_numpy())
    b = np.sort(ss.astype(str).agg("|".join, axis=1).to_numpy())
    diff = np.where(a != b)[0]
    assert (a == b).all(), f"{name}: values differ, first diffs {a[diff[:3]]} vs {b[diff[:3]]}"


def test_skew_tokens_long_doc_no_overflow(tmp_path, ray_session):
    """Regression: a ~60k-token document wraps c^4 in int64 (1.3e19 >
    2^63); the partial must switch to exact Python-int sums and still
    match the HUGEINT oracle."""
    import duckdb

    long_doc = " ".join(["w"] * 60000)
    df = pd.DataFrame(
        {"doc_id": range(3),
         "text": [long_doc, " ".join(["x"] * 59000), "a b c"],
         "lang": "en", "source": "s", "n_chars": 0}
    )
    d = tmp_path / "long"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    import __ray_entry__ as e

    r = e.queries()["skew_tokens"](str(d))
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    s = con.execute(e.oracle_sql()["skew_tokens"]).df()
    cols = sorted(r.columns)
    rr = r[cols].sort_values(cols).reset_index(drop=True)
    ss = s[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(rr, ss, check_dtype=False)


def test_lag_default_null_value_semantics(tmp_path, ray_session):
    """Regression: SQL LAG(v, 2, default) must return NULL (not the
    default) when the offset row EXISTS but carries a NULL value."""
    import duckdb

    ev = pd.DataFrame(
        {"event_id": range(6),
         "ts": pd.date_range("2024-03-01", periods=6, freq="min").astype("datetime64[us]"),
         "user_id": 1,
         "event_type": "click",
         "value": [1.0, None, 3.0, 4.0, None, 6.0],
         "props": '{"k": 1}'}
    )
    d = tmp_path / "nullv"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)
    import __ray_entry__ as e

    r = e.queries()["w_lag_k"](str(d))
    r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    s = con.execute(e.oracle_sql()["w_lag_k"]).df()
    cols = sorted(r.columns)
    rr = r[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ss = s[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rr, ss, check_dtype=False)
    # the NULL at turn 1 must surface as NULL at turn 3's lag2 (not -1)
    assert np.isnan(rr.loc[3, "lag2_def"])


def test_null_value_histogram_and_first_value(tmp_path, ray_session):
    """Regression trio: NULL values must be (a) skipped by the cents
    histograms (NaN->int64 would make a garbage INT64_MIN bin), and
    (b) RETURNED by FIRST_VALUE when the first row's value is NULL
    (pandas transform('first') would skip it)."""
    import duckdb

    ev = pd.DataFrame(
        {"event_id": range(8),
         "ts": pd.date_range("2024-04-01", periods=8, freq="h").astype("datetime64[us]"),
         "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
         "event_type": "click",
         "value": [None, 2.0, 3.0, 4.0, 5.0, None, 7.0, 8.0],
         "props": '{"k": 1}'}
    )
    d = tmp_path / "nullhist"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    for name in ("percentile_day", "w_mad_day", "w_first_value"):
        r = e.queries()[name](str(d))
        r = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        s = con.execute(e.oracle_sql()[name]).df()
        cols = sorted(r.columns)
        assert cols == sorted(s.columns), name
        rr = r[cols].sort_values(cols).reset_index(drop=True)
        ss = s[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if rr[c].dtype.kind == "M":
                rr[c] = rr[c].astype("datetime64[us]")
            if ss[c].dtype.kind == "M":
                ss[c] = ss[c].astype("datetime64[us]")
        pd.testing.assert_frame_equal(rr, ss, check_dtype=False)
    # conv 1's first value is NULL -> conv_first_value must be NULL everywhere
    fv = e.queries()["w_first_value"](str(d)).to_pandas()
    assert fv.loc[fv["conv_id"] == "1", "conv_first_value"].isna().all()
