"""Polars implementation of the per-bucket window kernel.

Same semantics as ``window_engine.compute_bucket_windows`` (the pandas
kernel, which doubles as the readable reference); this one is the hot
path: single-threaded-per-worker polars (Rust) expressions avoid the
~30 per-feature pandas groupby key re-hashes, cutting per-row cost ~5x.
Thread cap: POLARS_MAX_THREADS=1 is pinned before the first polars import
in each Ray worker so 32 workers don't spawn 32x32 threads.

Verified equivalences (tests/test_windows.py + oracle parity suite):
shift/rolling_mean(min_samples)/ewm_mean(adjust=False) over() match the
pandas groupby variants bit-for-bit within 1e-9 rtol.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from nfl_feature_store_ray.schemas import (
    COVER_WINDOW,
    EWMA_SPAN,
    FORM_WINDOW,
    QUANT_SCALE,
    SESSION_GAP_S,
)


def _pl():
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl


def kernel_arrow(
    tbl,
    metrics: tuple[str, ...] = ("value",),
    session_gap_s: int = SESSION_GAP_S,
    assign_turn_idx: bool = False,
    sort: bool = True,
    tie_col: str | None = None,
    phases: tuple[str, ...] = (),
) -> "pa.Table":
    """Arrow-in/Arrow-out window kernel (zero-copy into polars).

    The preferred hot path for map_batches over pre-partitioned data: no
    pandas materialization at all. ``sort=True`` sorts by
    (conv_id, ts, tie) inside polars."""
    pl = _pl()
    lf = pl.from_arrow(tbl)
    if sort:
        tie = tie_col or next((t for t in ("turn_idx", "_seq") if t in lf.columns), None)
        keys = ["conv_id", "ts"] + ([tie] if tie else [])
        lf = lf.sort(keys)
    if "turn_idx" in lf.columns and not assign_turn_idx:
        # engine invariant (FIXTURES.md F1): (conv_id, turn_idx) unique
        n_dup = lf.select(pl.struct(["conv_id", "turn_idx"]).is_duplicated().sum()).item()
        if n_dup:
            raise ValueError(f"duplicate (conv_id, turn_idx) rows in input: {n_dup}")
    out = _apply_window_exprs(
        pl, lf, metrics, session_gap_s, assign_turn_idx, FORM_WINDOW, COVER_WINDOW,
        EWMA_SPAN, phases,
    )
    return out.to_arrow()


def compute_bucket_windows_pl(
    df: pd.DataFrame,
    metrics: tuple[str, ...] = ("value",),
    session_gap_s: int = SESSION_GAP_S,
    assign_turn_idx: bool = False,
    form_window: int = FORM_WINDOW,
    cover_window: int = COVER_WINDOW,
    ewma_span: int = EWMA_SPAN,
    phases: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Vectorized window kernel over ONE sorted bucket (polars hot path).

    ``df`` must be sorted by (conv_id, ts, tie); returns pandas with the
    same column contract as the pandas kernel.
    """
    pl = _pl()
    lf = pl.from_pandas(df)
    out = _apply_window_exprs(
        pl, lf, metrics, session_gap_s, assign_turn_idx, form_window, cover_window,
        ewma_span, phases,
    )
    res = out.to_pandas()
    res["session_id"] = res["session_id"].astype("int32")
    res["session_turn_idx"] = res["session_turn_idx"].astype("int32")
    if assign_turn_idx:
        res["turn_idx"] = res["turn_idx"].astype("int32")
    return res


def _apply_window_exprs(
    pl,
    lf,
    metrics,
    session_gap_s,
    assign_turn_idx,
    form_window,
    cover_window,
    ewma_span,
    phases=(),
):
    c = pl.col
    conv = c("conv_id")

    over = {"partition_by": "conv_id"}
    exprs = [
        (c("ts") - c("ts").shift(1)).dt.total_microseconds().truediv(1e6)
        .over(**over)
        .alias("gap_s"),
    ]
    if assign_turn_idx:
        exprs.append(
            (conv.cum_count().over(**over) - 1).cast(pl.Int32).alias("turn_idx")
        )
    lf = lf.with_columns(exprs)

    lf = lf.with_columns(
        (c("gap_s") > session_gap_s)
        .fill_null(False)
        .cast(pl.Int32)
        .cum_sum()
        .over(**over)
        .alias("session_id")
    )
    lf = lf.with_columns(
        (conv.cum_count().over("conv_id", "session_id") - 1)
        .cast(pl.Int32)
        .alias("session_turn_idx")
    )

    role_exprs = []
    for r in ("user", "assistant", "tool"):
        oh = c(f"is_{r}").cast(pl.Int64)
        role_exprs.append((oh.cum_sum() - oh).over(**over).alias(f"n_prior_{r}"))
    it = c("is_tool").cast(pl.Int64)
    turn_pos = (conv.cum_count().over(**over) - 1).cast(pl.Float64)
    role_exprs += [
        (
            turn_pos
            - pl.when(it == 1).then(turn_pos).otherwise(None)
            .shift(1).forward_fill().over(**over)
        ).alias("turns_since_tool"),
        (
            (
                c("ts")
                - pl.when(it == 1).then(c("ts")).otherwise(None)
                .shift(1).forward_fill().over(**over)
            ).dt.total_microseconds()
            / 1e6
        ).alias("secs_since_tool"),
        it.cast(pl.Float64)
        .shift(1)
        .rolling_mean(cover_window, min_samples=1)
        .over(**over)
        .alias("roll10_tool_rate"),
    ]
    lf = lf.with_columns(role_exprs)

    # exact scaled-integer metric columns (schemas.QUANT_SCALE): expanding
    # sums over rint(x*scale) are order-independent (integers are exact in
    # float64 < 2^53) -> bit-identical to the pandas kernel and the
    # cents-exact SQL oracles regardless of partitioning. NULL-value
    # semantics (round 5, same as the pandas kernel): sums run on
    # ZERO-FILLED cents plus a separate non-null counter; rolling_mean
    # natively skips nulls (== SQL AVG); EWMA runs over the non-null
    # subsequence (ignore_nulls=True) with the carried value forward-
    # filled at null rows (== pandas ignore_na=True).
    lf = lf.with_columns(
        [(c(m).cast(pl.Float64) * QUANT_SCALE).round(0).alias(f"_c_{m}") for m in metrics]
        + [(c(m).cast(pl.Float64) * QUANT_SCALE).round(0).fill_null(0.0).alias(f"_c0_{m}")
           for m in metrics]
        + [c(m).is_not_null().cast(pl.Float64).alias(f"_nn_{m}") for m in metrics]
    )

    metric_exprs = []
    for m in metrics:
        x = c(m).cast(pl.Float64)
        xc0 = c(f"_c0_{m}")
        nnf = c(f"_nn_{m}")
        cntp = nnf.cum_sum() - nnf  # strictly-prior non-null count
        metric_exprs += [
            x.shift(1).over(**over).alias(f"last_{m}"),
            x.shift(1).rolling_mean(form_window, min_samples=1).over(**over).alias(f"form_{m}"),
            pl.when(cntp.over(**over) > 0)
            .then(((xc0.cum_sum() - xc0) / (QUANT_SCALE * cntp)).over(**over))
            .otherwise(None)
            .alias(f"avg_{m}"),
            x.ewm_mean(span=ewma_span, adjust=False, ignore_nulls=True)
            .forward_fill().shift(1).over(**over).alias(f"ewma_{m}"),
            # in-session prior sum / count for the seeded expanding family
            ((xc0.cum_sum() - xc0).over("conv_id", "session_id")).alias(f"_cs_{m}"),
            ((nnf.cum_sum() - nnf).over("conv_id", "session_id")).alias(f"_cnt_{m}"),
        ]
    lf = lf.with_columns(metric_exprs)

    # --- session-seeded expanding (W3): per-session aggregate + carryover --
    agg = lf.group_by(["conv_id", "session_id"], maintain_order=True).agg(
        [c(f"_c_{m}").sum().fill_null(0.0).alias(f"_total_{m}") for m in metrics]
        + [c(f"_c_{m}").count().alias(f"_n_{m}") for m in metrics]
        # seed = last NON-NULL raw value of the session (null if none)
        + [c(f"_c_{m}").drop_nulls().last().alias(f"_last_{m}") for m in metrics]
    )
    seed_exprs = []
    for m in metrics:
        seed = c(f"_last_{m}").shift(1).over("conv_id")
        final = (
            pl.when(c("session_id") == 0)
            .then(c(f"_total_{m}") / (QUANT_SCALE * c(f"_n_{m}")))
            .otherwise((seed + c(f"_total_{m}")) / (QUANT_SCALE * (1.0 + c(f"_n_{m}"))))
        )
        seed_exprs += [
            seed.alias(f"_seed_{m}"),
            final.shift(1).over("conv_id").alias(f"_prevfinal_{m}"),
        ]
    agg = agg.with_columns(seed_exprs).select(
        ["conv_id", "session_id"]
        + [f"_seed_{m}" for m in metrics]
        + [f"_prevfinal_{m}" for m in metrics]
    )
    lf = lf.join(agg, on=["conv_id", "session_id"], how="left")

    sess_exprs = []
    for m in metrics:
        sess_exprs.append(
            pl.when(c("session_id") == 0)
            .then(
                pl.when(c(f"_cnt_{m}") > 0)
                .then(c(f"_cs_{m}") / (QUANT_SCALE * c(f"_cnt_{m}")))
                .otherwise(None)
            )
            .otherwise(
                pl.when(c(f"_cnt_{m}") > 0)
                .then(
                    (c(f"_seed_{m}") + c(f"_cs_{m}"))
                    / (QUANT_SCALE * (1.0 + c(f"_cnt_{m}")))
                )
                .otherwise(c(f"_prevfinal_{m}"))
            )
            .alias(f"session_avg_{m}")
        )
    lf = lf.with_columns(sess_exprs)

    # --- per-phase (role-split) families: inclusive per-(conv, role)
    # aggregates, then "value at the last strictly-prior phase row" (same
    # semantics as the pandas kernel / reference fold). The propagation is
    # a per-phase segmented cummax + O(n) gathers instead of one
    # when/shift/ffill window op per output column — at 20 metrics x 2
    # phases that's 160 window ops avoided (measured ~2x kernel speedup).
    if phases:
        import numpy as np

        pr = {"partition_by": ["conv_id", "role"]}
        incl_exprs = []
        for m in metrics:
            x = c(m).cast(pl.Float64)
            xc0 = (x * QUANT_SCALE).round(0).fill_null(0.0)
            nnf = x.is_not_null().cast(pl.Float64)
            icnt = nnf.cum_sum()  # inclusive NON-NULL count
            incl_exprs += [
                pl.when(icnt.over(**pr) > 0)
                .then((xc0.cum_sum() / (QUANT_SCALE * icnt)).over(**pr))
                .otherwise(None)
                .alias(f"_iavg_{m}"),
                x.rolling_mean(form_window, min_samples=1).over(**pr).alias(f"_iform_{m}"),
                x.ewm_mean(span=ewma_span, adjust=False, ignore_nulls=True)
                .forward_fill().over(**pr).alias(f"_iewma_{m}"),
            ]
        lf = lf.with_columns(incl_exprs)

        n = lf.height
        rows = np.arange(n, dtype=np.int64)
        new_conv = (
            (c("conv_id") != c("conv_id").shift(1)).fill_null(True)
        )
        seg = lf.select(new_conv.cum_sum().alias("s"))["s"].to_numpy().astype(np.int64) - 1
        role_arr = lf["role"].to_numpy()
        def _last_prior(vmask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """(valid, safe-index) of the last vmask row STRICTLY before
            each row within its conv segment — encode (segment, row+1) so
            one cummax restarts per conv (later segments dominate)."""
            enc = seg * (n + 2) + np.where(vmask, rows + 1, 0)
            cm = np.maximum.accumulate(enc)
            lpi_incl = cm % (n + 2) - 1
            lpi = np.empty(n, dtype=np.int64)
            if n:  # empty blocks still need the full phase-column schema
                lpi[1:] = lpi_incl[:-1]
                lpi[0] = -1
                lpi[np.flatnonzero(seg[1:] != seg[:-1]) + 1] = -1
            return lpi >= 0, np.maximum(lpi, 0)

        phase_cols = {}
        for p in phases:
            mask = role_arr == p
            valid, safe = _last_prior(mask)
            for m in metrics:
                for fam, col in (
                    ("last", m), ("form", f"_iform_{m}"),
                    ("avg", f"_iavg_{m}"), ("ewma", f"_iewma_{m}"),
                ):
                    arr = lf[col].to_numpy().astype(np.float64)
                    if np.isnan(arr[mask]).any():
                        # NULL-value semantics: propagation skips a NULL
                        # aggregate at a phase row (SQL LAST_VALUE(CASE..)
                        # IGNORE NULLS == the pandas kernel's ffill) —
                        # slow path only when this column actually has
                        # NULLs at phase rows
                        v2, s2 = _last_prior(mask & ~np.isnan(arr))
                        phase_cols[f"{fam}_{m}_{p}"] = np.where(
                            v2, arr[s2], np.nan
                        )
                    else:
                        phase_cols[f"{fam}_{m}_{p}"] = np.where(
                            valid, arr[safe], np.nan
                        )
        lf = lf.hstack(pl.DataFrame(phase_cols)).drop(
            [f"_{fam}_{m}" for m in metrics for fam in ("iavg", "iform", "iewma")]
        )

    drop = [f"_{p}_{m}" for m in metrics
            for p in ("c", "c0", "nn", "cs", "cnt", "seed", "prevfinal")]
    return lf.drop(drop)


def _self_check():
    """Cross-check vs the pandas kernel on a synthetic bucket (dev aid)."""
    from nfl_feature_store_ray.sources.transcripts import generate_transcripts
    from nfl_feature_store_ray.state.window_engine import compute_bucket_windows

    df = (
        generate_transcripts(n_convs=50, mean_turns=20, seed=5)
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    df["text_len"] = df["text"].str.len()
    for r in ("user", "assistant", "tool"):
        df[f"is_{r}"] = (df["role"] == r).astype("int8")
    a = compute_bucket_windows(df.copy(), metrics=("value", "text_len"))
    b = compute_bucket_windows_pl(df.copy(), metrics=("value", "text_len"))
    for col in a.columns:
        if a[col].dtype.kind in "fc":
            np.testing.assert_allclose(
                a[col].to_numpy(float), b[col].to_numpy(float),
                rtol=1e-9, atol=1e-12, equal_nan=True, err_msg=col,
            )
    return True
