"""Driver-gated lifecycle queries: manifests/resume (S5/S6) and the
streaming window engine — both pinned against DuckDB oracles instead of
tests only (round-2 verdict #4/#6).

Reference analogue: the runner's whole-file staleness scan + rewrite loop
(`/root/reference/feature_store_runner.py:39-55`); the rebuild's contract
is per-partition fingerprint manifests whose second run SKIPS every
partition (north rule: "resumes mid-shuffle, per-partition lineage").
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import ray.data

from nfl_feature_store_ray.functions.rounding import round_half_away
from nfl_feature_store_ray.pipelines.partitioned import (
    ingest_partitioned_with_transform,
    partition_files,
    sort_partition,
    window_features_streaming,
)
from nfl_feature_store_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)

_T = f"WITH t AS ({TRANSCRIPTS_FROM_EVENTS_SQL})"
RESUME_BUCKETS = 16


def _gate_dir(prefix: str, sf_dir: str) -> str:
    from nfl_feature_store_ray.functions.scratch import scratch_dir

    return scratch_dir(prefix, sf_dir)


def q_resume_manifest(sf_dir: str):
    """S5/S6 end-to-end gate: partition-write the transcript table TWICE
    into a fresh directory. Run 1 must write every partition (0 skipped);
    run 2 must SKIP every partition on fingerprint match. The query
    returns the content read back from the committed partition files —
    proving the parquet round-trip — with the two runs' skip counts as
    constant columns, so the DuckDB oracle (the same transcript rows +
    the expected constants) hash-fails if either the content or the
    skip behavior ever breaks."""
    out_dir = _gate_dir("nfl_fs_resume_gate", sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    man1 = ingest_partitioned_with_transform(
        transcripts_from_events(sf_dir), out_dir, transform=sort_partition,
        num_buckets=RESUME_BUCKETS,
    )
    man2 = ingest_partitioned_with_transform(
        transcripts_from_events(sf_dir), out_dir, transform=sort_partition,
        num_buckets=RESUME_BUCKETS,
    )
    # the invariant, not the absolute bucket count (empty hash buckets
    # produce no partition, so n_parts varies with sf): run 1 skips
    # NOTHING, run 2 skips EVERY partition run 1 wrote
    run1_skipped = int(man1["skipped"].sum())
    run2_all_skipped = bool(man2["skipped"].all()) and len(man2) == len(man1) > 0

    content = ray.data.read_parquet(
        partition_files(out_dir), columns=["conv_id", "_seq", "role", "value"]
    )

    def tag_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value"] = round_half_away(df["value"].astype("float64"), 6)
        df["run1_skipped"] = np.int64(run1_skipped)
        df["run2_all_skipped"] = bool(run2_all_skipped)
        return df

    return content.map_batches(tag_counts, batch_format="pandas")


SQL_RESUME_MANIFEST = f"""{_T}
SELECT conv_id, _seq, role, ROUND(value, 6) AS value,
       0 AS run1_skipped,
       TRUE AS run2_all_skipped
FROM t
"""


def q_rolling_streaming(sf_dir: str):
    """Streaming-engine gate: the SAME feature surface as ``w_rolling``
    (rolling(3) mean + rolling(10) tool-rate, both shifted) but computed
    by the stateful StreamingWindowActor over the sorted partitioned
    layout — pinned against the identical DuckDB window-function oracle,
    so batch engine == streaming engine == SQL inside the driver gate.

    The partitioned layout is (re)built via the resumable ingest: a warm
    directory with matching fingerprints skips every partition write."""
    part_dir = _gate_dir("nfl_fs_stream_gate", sf_dir)
    ingest_partitioned_with_transform(
        transcripts_from_events(sf_dir), part_dir, transform=sort_partition,
        num_buckets=RESUME_BUCKETS,
    )
    feats = window_features_streaming(part_dir, metrics=("value",))

    def select(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["conv_id", "turn_idx", "form_value", "roll10_tool_rate"]].copy()
        for c in ("form_value", "roll10_tool_rate"):
            out[c] = round_half_away(out[c].astype("float64"), 6)
        return out

    return feats.map_batches(select, batch_format="pandas")


_W = "PARTITION BY conv_id ORDER BY ts, _seq"

# identical surface to transcript_queries.SQL_ROLLING — by design: the gate
# pins batch engine == streaming engine == SQL on the same oracle text
SQL_ROLLING_STREAMING = f"""{_T}
SELECT conv_id, turn_idx,
       ROUND(AVG(value) OVER ({_W} ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6)
         AS form_value,
       ROUND(AVG(CASE WHEN role = 'tool' THEN 1.0 ELSE 0.0 END)
             OVER ({_W} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 6)
         AS roll10_tool_rate
FROM t
"""

def q_incremental_append(sf_dir: str):
    """INCREMENTAL UPSERT gate: ingest a time-prefix of the transcripts,
    run the incremental engine (persisted per-conversation streaming
    state, `state.incremental`), then ingest the FULL data and run it
    again — the second pass must process ONLY the appended turns, seeded
    by the checkpointed state. The union of the two phases' outputs is
    gated against the SAME SQL oracle text as ``w_rolling`` /
    ``w_rolling_streaming``, so the driver pins

        incremental(prefix) ∪ incremental(appended) == batch == DuckDB

    — the reference's daily whole-season recompute
    (`feature_store_runner.py:39-55`) replaced by a true append-only
    update. Phase outputs are materialized before the re-ingest rewrites
    partitions; in production each phase's features land in parquet."""
    from nfl_feature_store_ray.state.incremental import window_features_incremental

    part_dir = _gate_dir("nfl_fs_incr_gate_parts", sf_dir)
    state_dir = _gate_dir("nfl_fs_incr_gate_state", sf_dir)
    shutil.rmtree(part_dir, ignore_errors=True)
    shutil.rmtree(state_dir, ignore_errors=True)

    ts_all = transcripts_from_events(sf_dir)
    # deterministic append cutoff: midpoint of the event time range — a
    # time cut is append-consistent (rows <= cutoff are a per-conversation
    # prefix under (ts, _seq) order); the oracle is cutoff-independent
    lo = ts_all.min("ts")
    hi = ts_all.max("ts")
    cutoff = lo + (hi - lo) / 2

    def select(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["conv_id", "turn_idx", "form_value", "roll10_tool_rate"]].copy()
        for c in ("form_value", "roll10_tool_rate"):
            out[c] = round_half_away(out[c].astype("float64"), 6)
        return out

    def run_phase(ds):
        ingest_partitioned_with_transform(
            ds, part_dir, transform=sort_partition, num_buckets=RESUME_BUCKETS,
        )
        out = window_features_incremental(part_dir, state_dir, metrics=("value",))
        return out.map_batches(select, batch_format="pandas").materialize()

    phase1 = run_phase(
        transcripts_from_events(sf_dir).map_batches(
            lambda df: df[df["ts"] <= cutoff], batch_format="pandas"
        )
    )
    phase2 = run_phase(transcripts_from_events(sf_dir))
    return phase1.union(phase2)


QUERIES = {
    "resume_manifest": q_resume_manifest,
    "w_rolling_streaming": q_rolling_streaming,
    "w_incremental_append": q_incremental_append,
}

ORACLES = {
    "resume_manifest": SQL_RESUME_MANIFEST,
    "w_rolling_streaming": SQL_ROLLING_STREAMING,
    "w_incremental_append": SQL_ROLLING_STREAMING,
}
