"""Deliberately naive single-process oracle (FIXTURES.md §Oracle).

Implements the verified reference semantics (SURVEY.md §0 probes 1-6, §2.6)
with per-conversation PYTHON LOOPS — independent of the engine's vectorized
kernels, so a shared bug in a clever formulation can't hide. The engine
must match `numpy.allclose(rtol=1e-9, atol=1e-12, equal_nan=True)`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nfl_feature_store_ray.schemas import (
    COVER_WINDOW,
    EWMA_ALPHA,
    FORM_WINDOW,
    SESSION_GAP_S,
)


def oracle_windows(
    df: pd.DataFrame,
    metrics: tuple[str, ...] = ("value",),
    session_gap_s: int = SESSION_GAP_S,
    phases: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Row-loop reference implementation over a transcript frame.

    Input needs: conv_id, ts, turn_idx (ordering), role, is_* one-hots and
    the metric columns. Output: one row per input row, sorted by
    (conv_id, ts, turn_idx), with every window-family feature.
    """
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out_rows = []
    for conv_id, grp in df.groupby("conv_id", sort=True):
        prev_ts = None
        session_id = 0
        session_turn = 0
        n_prior = {"user": 0, "assistant": 0, "tool": 0}
        last_tool_i = None
        last_tool_ts = None
        tool_flags: list[int] = []
        hist: dict[str, list[float]] = {m: [] for m in metrics}
        ewma: dict[str, float | None] = {m: None for m in metrics}
        # seeded session-expanding state per metric
        sess_vals: dict[str, list[float]] = {m: [] for m in metrics}
        sess_seed: dict[str, float | None] = {m: None for m in metrics}
        sess_prev_final: dict[str, float | None] = {m: None for m in metrics}
        first_session = True
        # per-phase histories: features at row i aggregate the phase rows
        # STRICTLY before i (updated post-emission like everything else)
        phist: dict = {m: {p: [] for p in phases} for m in metrics}
        pewma: dict = {m: {p: None for p in phases} for m in metrics}

        for i, (_, row) in enumerate(grp.iterrows()):
            rec = {"conv_id": conv_id, "turn_idx": row["turn_idx"], "ts": row["ts"]}
            gap = np.nan if prev_ts is None else (row["ts"] - prev_ts).total_seconds()
            rec["gap_s"] = gap
            if prev_ts is not None and gap > session_gap_s:
                # close the old session
                for m in metrics:
                    vals = sess_vals[m]
                    if first_session:
                        final = float(np.mean(vals)) if vals else np.nan
                    else:
                        final = (sess_seed[m] + sum(vals)) / (1.0 + len(vals))
                    sess_prev_final[m] = final
                    sess_seed[m] = vals[-1] if vals else None
                    sess_vals[m] = []
                first_session = False
                session_id += 1
                session_turn = 0
            rec["session_id"] = session_id
            rec["session_turn_idx"] = session_turn

            for r in ("user", "assistant", "tool"):
                rec[f"n_prior_{r}"] = n_prior[r]
            rec["turns_since_tool"] = np.nan if last_tool_i is None else i - last_tool_i
            rec["secs_since_tool"] = (
                np.nan
                if last_tool_ts is None
                else (row["ts"] - last_tool_ts).total_seconds()
            )
            wt = tool_flags[-COVER_WINDOW:]
            rec["roll10_tool_rate"] = float(np.mean(wt)) if wt else np.nan

            for m in metrics:
                h = hist[m]
                rec[f"last_{m}"] = h[-1] if h else np.nan
                wf = h[-FORM_WINDOW:]
                rec[f"form_{m}"] = float(np.mean(wf)) if wf else np.nan
                rec[f"avg_{m}"] = float(np.mean(h)) if h else np.nan
                rec[f"ewma_{m}"] = np.nan if ewma[m] is None else ewma[m]
                # seeded session expanding (probe 3 truth table)
                sv = sess_vals[m]
                if first_session:
                    rec[f"session_avg_{m}"] = float(np.mean(sv)) if sv else np.nan
                else:
                    if not sv:
                        rec[f"session_avg_{m}"] = sess_prev_final[m]
                    else:
                        rec[f"session_avg_{m}"] = (sess_seed[m] + sum(sv)) / (1.0 + len(sv))
                for p in phases:
                    ph = phist[m][p]
                    rec[f"last_{m}_{p}"] = ph[-1] if ph else np.nan
                    pf = ph[-FORM_WINDOW:]
                    rec[f"form_{m}_{p}"] = float(np.mean(pf)) if pf else np.nan
                    rec[f"avg_{m}_{p}"] = float(np.mean(ph)) if ph else np.nan
                    rec[f"ewma_{m}_{p}"] = (
                        np.nan if pewma[m][p] is None else pewma[m][p]
                    )

            # ---- update state with the CURRENT row (post-emission: shift) --
            role = row["role"]
            n_prior[role] = n_prior[role] + 1
            if role == "tool":
                last_tool_i = i
                last_tool_ts = row["ts"]
            tool_flags.append(1 if role == "tool" else 0)
            for m in metrics:
                v = float(row[m])
                hist[m].append(v)
                sess_vals[m].append(v)
                ewma[m] = v if ewma[m] is None else (1 - EWMA_ALPHA) * ewma[m] + EWMA_ALPHA * v
                if role in phases:
                    phist[m][role].append(v)
                    pewma[m][role] = (
                        v if pewma[m][role] is None
                        else (1 - EWMA_ALPHA) * pewma[m][role] + EWMA_ALPHA * v
                    )
            prev_ts = row["ts"]
            session_turn += 1
            out_rows.append(rec)

    return pd.DataFrame(out_rows)


def assert_feature_parity(engine: pd.DataFrame, oracle: pd.DataFrame, keys=("conv_id", "turn_idx")):
    e = engine.sort_values(list(keys), kind="mergesort").reset_index(drop=True)
    o = oracle.sort_values(list(keys), kind="mergesort").reset_index(drop=True)
    assert len(e) == len(o), f"row count {len(e)} != {len(o)}"
    for c in o.columns:
        assert c in e.columns, f"missing column {c}"
        if o[c].dtype.kind in "fc":
            np.testing.assert_allclose(
                e[c].to_numpy(dtype=float),
                o[c].to_numpy(dtype=float),
                rtol=1e-9,
                atol=1e-12,
                equal_nan=True,
                err_msg=f"column {c}",
            )
        else:
            pd.testing.assert_series_equal(
                e[c].reset_index(drop=True),
                o[c].reset_index(drop=True),
                check_dtype=False,
                check_names=False,
                obj=f"column {c}",
            )
