"""Incremental streaming window engine — actor pool with carry state.

The batch engine (`window_engine`) computes each conversation's windows in
one vectorized scan over a whole bucket. This module is the STREAMING
variant the north rule describes: a stateful actor pool where each actor
holds, per conversation,

  - a bounded RAW TAIL (the last max(FORM_WINDOW, COVER_WINDOW) rows) for
    the ring-buffer families (lag-1, rolling-3, rolling-10 indicator),
  - O(1) REGISTERS for the unbounded families (expanding sum/count, EWMA
    register, per-role counters, tool positions, session aggregates with
    carryover seed),
  - a MONOTONIC-TIMESTAMP WATERMARK (asserted per conversation: a batch
    whose first ts precedes the watermark is rejected — out-of-order
    delivery would corrupt prefix state).

Each `__call__` consumes one sorted batch (whole-conversation order is the
partition layout's contract: batches of one partition block arrive in
order within a single map task), updates state, and emits exactly one
feature row per input row. Because state is O(tail + registers) per
conversation, a conversation LARGER THAN WORKER MEMORY streams through in
bounded space — the "two-pass prefix chaining" answer for hot
conversations (SURVEY §7.3).

Equivalence with the batch engine is enforced by tests for every batch
size (1 row per batch up to whole-partition batches). PRECISION CONTRACT
(ADVICE r2): every family is bit-identical to the batch kernels EXCEPT
ewma, which uses the chunked closed form below — mathematically equal to
the recursive pandas/polars ewm but not bitwise, so ewma equality across
the streaming/batch paths is ALLCLOSE (rtol 1e-9), not exact; after 6dp
rounding a value sitting exactly at a 5e-7 tie could therefore round
differently between the two paths. The driver-gated streaming query
(`pipelines.resume_queries.q_rolling_streaming`) deliberately pins
rolling families, which ARE exact.

Failure semantics: conversations never span blocks (the partition layout
guarantees it), so a task retry on a FRESH actor replays its block
correctly from empty state. A retry routed to an actor that already holds
partial state for the block's conversations trips the watermark check and
fails loudly — correctness over availability; rerun the job (manifests
make that cheap) rather than risk silently corrupted prefix state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from nfl_feature_store_ray.schemas import (
    COVER_WINDOW,
    EWMA_ALPHA,
    FORM_WINDOW,
    QUANT_SCALE,
    SESSION_GAP_S,
)

_TAIL = max(FORM_WINDOW, COVER_WINDOW)


def _ewma_scan(x: np.ndarray, reg: float | None, alpha: float, chunk: int = 64):
    """Inclusive EWMA (adjust=False) over ``x`` carrying register ``reg``.

    Chunked closed form instead of a per-row Python loop:
      z_j = b^(j+1) * reg + a * b^j * cumsum(x_t / b^t),  b = 1 - a
    renormalized every ``chunk`` rows so 1/b^t never overflows. Returns
    (z, reg_out) where z[j] is the EWMA AFTER consuming x[j].
    """
    n = len(x)
    z = np.empty(n)
    b = 1.0 - alpha
    i = 0
    if reg is None:
        if n == 0:
            return z, None
        z[0] = reg = float(x[0])
        i = 1
    while i < n:
        xs = x[i : i + chunk]
        k = len(xs)
        bj = b ** np.arange(k)
        zc = b * bj * reg + alpha * bj * np.cumsum(xs / bj)
        z[i : i + k] = zc
        reg = float(zc[-1])
        i += k
    return z, reg


@dataclass
class _PhaseState:
    """Per-(conversation, metric, role) registers for phase families.

    ``prev_*`` hold the INCLUSIVE aggregates at the most recent phase row
    seen so far — exactly the values every later row propagates until the
    next phase row (the batch kernels' shift+ffill semantics)."""

    count: int = 0  # phase ROWS seen (window extent)
    ncount: int = 0  # NON-NULL phase values seen (divisors / EWMA index)
    csum: float = 0.0  # cents sum over non-null phase values (exact ints)
    tail: list = field(default_factory=list)  # last <= FORM_WINDOW raw values
    ewma: float | None = None
    # last NON-NULL inclusive aggregate per family (NULL-skip propagation,
    # == the batch kernels' ffill / LAST_VALUE IGNORE NULLS)
    prev_last: float = float("nan")
    prev_form: float = float("nan")
    prev_avg: float = float("nan")
    prev_ewma: float = float("nan")


@dataclass
class _MetricState:
    tail: list = field(default_factory=list)  # last <= _TAIL raw values
    total: float = 0.0  # expanding sum
    count: int = 0  # expanding count
    ewma: float | None = None
    # session-seeded expanding registers
    sess_sum: float = 0.0
    sess_cnt: int = 0
    sess_last: float | None = None
    seed: float | None = None  # last raw value of the PRIOR session
    prev_final: float | None = None  # prior session's final expanding value
    first_session: bool = True
    # phase name -> _PhaseState (per-role window families)
    phase: dict = field(default_factory=dict)


@dataclass
class _ConvState:
    turns: int = 0
    prev_ts: pd.Timestamp | None = None
    session_id: int = 0
    sess_turn: int = 0
    n_role: dict = field(default_factory=lambda: {"user": 0, "assistant": 0, "tool": 0})
    last_tool_pos: int | None = None
    last_tool_ts: pd.Timestamp | None = None
    tool_ring: list = field(default_factory=list)  # last <= COVER_WINDOW 0/1
    watermark: pd.Timestamp | None = None
    metrics: dict = field(default_factory=dict)  # name -> _MetricState


class StreamingWindowActor:
    """map_batches callable class (actor pool): incremental window state.

    Batches MUST be sorted by (conv_id, ts, tie) and delivered in order
    per conversation (guaranteed when reading the sorted partitioned
    layout: one partition block per task, batches in block order).
    """

    def __init__(
        self,
        metrics: tuple[str, ...] = ("value",),
        session_gap_s: int = SESSION_GAP_S,
        phases: tuple[str, ...] = (),
    ):
        self.metric_names = metrics
        self.gap = session_gap_s
        self.phases = phases
        self.state: dict[str, _ConvState] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for conv_id, g in df.groupby("conv_id", sort=False):
            outs.append(self._run_conv(conv_id, g))
        if outs:
            # one DataFrame per BATCH (column-wise concat of per-conv
            # arrays), not one per conversation — frame construction was a
            # profiled hot spot at many conversations per batch
            return pd.DataFrame(
                {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
            )
        # empty batch: emit the OUTPUT schema, not the input schema, so a
        # zero-row block can't wedge the downstream schema check
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in self._output_schema()})

    def _output_schema(self) -> list[tuple[str, str]]:
        cols = [
            ("conv_id", "object"), ("ts", "datetime64[us]"), ("turn_idx", "int32"),
            ("gap_s", "float64"), ("session_id", "int32"), ("session_turn_idx", "int32"),
            ("n_prior_user", "int64"), ("n_prior_assistant", "int64"),
            ("n_prior_tool", "int64"), ("turns_since_tool", "float64"),
            ("secs_since_tool", "float64"), ("roll10_tool_rate", "float64"),
        ]
        # MUST mirror _run_conv's per-metric insertion order exactly (base
        # families, then session_avg, then that metric's phase families) so
        # an empty batch's zero-row block has the same Arrow field order as
        # every non-empty block
        for m in self.metric_names:
            cols += [(f"{p}_{m}", "float64")
                     for p in ("last", "form", "avg", "ewma", "session_avg")]
            for ph in self.phases:
                cols += [(f"{fam}_{m}_{ph}", "float64")
                         for fam in ("last", "form", "avg", "ewma")]
        return cols

    # ------------------------------------------------------------------
    def _run_conv(self, conv_id: str, g: pd.DataFrame) -> pd.DataFrame:
        s = self.state.setdefault(conv_id, _ConvState())
        n = len(g)
        ts = g["ts"].to_numpy()
        if s.watermark is not None and ts[0] < np.datetime64(s.watermark):
            raise ValueError(
                f"watermark violation for conv {conv_id}: batch starts at "
                f"{ts[0]} before watermark {s.watermark}"
            )

        out = {
            "conv_id": g["conv_id"].to_numpy(),
            "ts": g["ts"].to_numpy(),
            "turn_idx": (s.turns + np.arange(n)).astype("int32"),
        }
        role = g["role"].to_numpy()
        is_tool = role == "tool"

        # --- gap + sessions (scalar prefix logic, vectorized per segment)
        # subtract in EXACT integer microseconds FIRST, divide once: at
        # epoch scale (~1.7e9 s) a per-timestamp /1e6 rounds to ~2.4e-7 s
        # before the subtraction, which drifted gap_s ~1e-7 off the batch
        # kernel's (ts - prev).total_seconds() (caught by the 12.8M-turn
        # three-path equality audit, round 4)
        ts_us = ts.astype("datetime64[us]").astype("int64")
        prev_us = np.empty(n, dtype="int64")
        prev_us[1:] = ts_us[:-1]
        have_prev = s.prev_ts is not None
        prev_us[0] = (
            np.datetime64(s.prev_ts, "us").astype("int64") if have_prev else 0
        )
        gap = (ts_us - prev_us) / 1e6
        if not have_prev:
            gap[0] = np.nan
        out["gap_s"] = gap
        brk = np.nan_to_num(gap, nan=0.0) > self.gap
        sess_ids = s.session_id + np.cumsum(brk).astype("int64")
        out["session_id"] = sess_ids.astype("int32")
        # session_turn_idx: continue counter until first break, then reset
        sti = np.empty(n, dtype="int64")
        seg_start = 0
        cur = s.sess_turn
        break_positions = list(np.flatnonzero(brk)) + [n]
        for bp in break_positions:
            ln = bp - seg_start
            if ln > 0:
                sti[seg_start:bp] = cur + np.arange(ln)
            if bp < n:
                cur = 0
                seg_start = bp
        out["session_turn_idx"] = sti.astype("int32")

        # --- per-role prior counts
        for r in ("user", "assistant", "tool"):
            oh = (role == r).astype("int64")
            out[f"n_prior_{r}"] = s.n_role[r] + np.cumsum(oh) - oh

        # --- tool lags (positions/ts are monotonic, so "latest prior tool
        # row" == running max — vectorized with maximum.accumulate + carry)
        pos = s.turns + np.arange(n)
        carry_pos = -1.0 if s.last_tool_pos is None else float(s.last_tool_pos)
        tool_pos = np.where(is_tool, pos.astype("float64"), -1.0)
        prev_tool = np.maximum.accumulate(np.concatenate([[carry_pos], tool_pos]))[:-1]
        out["turns_since_tool"] = np.where(prev_tool >= 0, pos - prev_tool, np.nan)
        # same diff-first discipline in integer microseconds (sentinel
        # -2^62 = "no prior tool", far below any real epoch)
        _NO_TOOL = np.int64(-(2 ** 62))
        carry_ts_us = (
            _NO_TOOL
            if s.last_tool_ts is None
            else np.datetime64(s.last_tool_ts, "us").astype("int64")
        )
        tool_ts_us = np.where(is_tool, ts_us, _NO_TOOL)
        prev_tool_ts_us = np.maximum.accumulate(
            np.concatenate([[carry_ts_us], tool_ts_us])
        )[:-1]
        out["secs_since_tool"] = np.where(
            prev_tool_ts_us != _NO_TOOL, (ts_us - prev_tool_ts_us) / 1e6, np.nan
        )

        # --- rolling tool rate (ring carry: prepend tail flags)
        flags = np.concatenate([np.asarray(s.tool_ring, dtype="float64"), is_tool.astype("float64")])
        k = len(s.tool_ring)
        out["roll10_tool_rate"] = _rolling_shifted_with_prefix(
            flags, k, n, COVER_WINDOW, s.turns
        )

        # per-phase in-batch propagation indices (metric-independent):
        # lpi[i] = index of the last phase row STRICTLY before row i in
        # this batch (-1 -> carry the register from previous batches)
        phase_prop = {}
        for ph in self.phases:
            pmask = role == ph
            marker = np.where(pmask, np.arange(n), -1)
            lpi_incl = np.maximum.accumulate(marker)
            lpi = np.empty(n, dtype=np.int64)
            lpi[0] = -1
            lpi[1:] = lpi_incl[:-1]
            # NOTE: named ppos, NOT pos — `pos` above holds the GLOBAL
            # row positions that the conv-level state commit reads for
            # last_tool_pos; rebinding it here silently corrupted the
            # tool-lag carry whenever phases were enabled (caught by the
            # round-5 chained-subrange phase test at sub-range boundaries)
            ppos = np.full(n, -1, dtype=np.int64)
            ppos[np.flatnonzero(pmask)] = np.arange(int(pmask.sum()))
            phase_prop[ph] = (pmask, lpi, ppos)

        # --- metric families
        for m in self.metric_names:
            x = g[m].to_numpy(dtype="float64")
            ms = s.metrics.setdefault(m, _MetricState())

            tail = np.asarray(ms.tail, dtype="float64")
            allv = np.concatenate([tail, x])
            kt = len(tail)
            # lag-1: prior value is allv[kt+i-1]; first-ever turn -> NaN
            lastv = np.full(n, np.nan)
            idx = kt + np.arange(n) - 1
            ok = (s.turns + np.arange(n)) > 0
            lastv[ok] = allv[idx[ok]]
            out[f"last_{m}"] = lastv

            out[f"form_{m}"] = _rolling_shifted_with_prefix(
                allv, kt, n, FORM_WINDOW, s.turns
            )

            # expanding (register offset) — sums run on exact scaled
            # integers (schemas.QUANT_SCALE) so the streaming result is
            # bit-identical to the batch kernel at any batch split.
            # NULL-value semantics (round 5, == batch kernels): NULLs are
            # zero-filled in the sum and excluded from the count; the
            # count register tracks NON-NULL rows only
            nn = ~np.isnan(x)
            nnf = nn.astype("float64")
            xc = np.where(nn, np.rint(x * QUANT_SCALE), 0.0)
            cs = np.cumsum(xc)
            prior_sum = ms.total + cs - xc
            prior_cnt = ms.count + np.cumsum(nnf) - nnf
            with np.errstate(invalid="ignore", divide="ignore"):
                out[f"avg_{m}"] = np.where(
                    prior_cnt > 0, prior_sum / (QUANT_SCALE * prior_cnt), np.nan
                )

            # EWMA (register carry, vectorized chunked closed-form scan
            # over the NON-NULL subsequence == pandas ignore_na=True);
            # output at row i is the register before consuming row i's
            # value: the last non-null row's EWMA strictly before i
            reg_in = ms.ewma
            xs_nn = x[nn]
            z, ms.ewma = _ewma_scan(xs_nn, reg_in, EWMA_ALPHA)
            carry = np.nan if reg_in is None else reg_in
            has_prior, lvi = _last_valid_prior(nn, n)
            if len(xs_nn):
                zpos = np.full(n, -1, dtype=np.int64)
                zpos[np.flatnonzero(nn)] = np.arange(len(xs_nn))
                e = np.where(has_prior, z[np.maximum(zpos[lvi], 0)], carry)
            else:
                e = np.full(n, carry)
            out[f"ewma_{m}"] = e

            # session-seeded expanding (segment loop; breaks are rare) —
            # all sums/seeds held in exact scaled integers (cents)
            sa = np.empty(n)
            seg_start = 0
            for bp in break_positions:
                if bp > seg_start:
                    seg = slice(seg_start, bp)
                    xs = xc[seg]          # zero-filled cents
                    nns = nnf[seg]        # 0/1 non-null indicator
                    cs_in = ms.sess_sum + np.cumsum(xs) - xs
                    cnt_in = ms.sess_cnt + np.cumsum(nns) - nns
                    seed_v = np.nan if ms.seed is None else ms.seed
                    if ms.first_session:
                        with np.errstate(invalid="ignore", divide="ignore"):
                            sa[seg] = np.where(
                                cnt_in > 0,
                                cs_in / (QUANT_SCALE * np.maximum(cnt_in, 1)),
                                np.nan,
                            )
                    else:
                        base = (seed_v + cs_in) / (QUANT_SCALE * (1.0 + cnt_in))
                        sa[seg] = np.where(
                            cnt_in > 0,
                            base,
                            np.nan if ms.prev_final is None else ms.prev_final,
                        )
                    ms.sess_sum += float(np.sum(xs))
                    ms.sess_cnt += int(np.sum(nns))
                    nz = np.flatnonzero(nns)
                    if len(nz):  # seed = last NON-NULL raw value of session
                        ms.sess_last = float(xs[nz[-1]])
                if bp < n:  # close the session at the break
                    seed_v = np.nan if ms.seed is None else ms.seed
                    if ms.first_session:
                        ms.prev_final = (
                            ms.sess_sum / (QUANT_SCALE * ms.sess_cnt)
                            if ms.sess_cnt else None
                        )
                    else:
                        ms.prev_final = (seed_v + ms.sess_sum) / (
                            QUANT_SCALE * (1.0 + ms.sess_cnt)
                        )
                    ms.seed = ms.sess_last
                    ms.first_session = False
                    ms.sess_sum = 0.0
                    ms.sess_cnt = 0
                    ms.sess_last = None  # all-NULL sessions seed NULL
                    seg_start = bp
            out[f"session_avg_{m}"] = sa

            # --- per-phase families: inclusive aggregates at phase rows,
            # propagated to every later row via carry registers + an
            # in-batch last-phase-row gather (batch kernels' shift+ffill)
            for ph in self.phases:
                pmask, lpi, ppos = phase_prop[ph]
                ps = ms.phase.setdefault(ph, _PhaseState())
                idxs = np.flatnonzero(pmask)
                k = len(idxs)
                if k:
                    xs = x[idxs]          # raw phase values (may be NaN)
                    xcs = xc[idxs]        # zero-filled cents
                    nnp = nn[idxs]
                    cnt_i = ps.ncount + np.cumsum(nnp.astype("float64"))
                    with np.errstate(invalid="ignore", divide="ignore"):
                        avg_i = np.where(
                            cnt_i > 0,
                            (ps.csum + np.cumsum(xcs))
                            / (QUANT_SCALE * np.maximum(cnt_i, 1)),
                            np.nan,
                        )
                    ptail = np.asarray(ps.tail, dtype="float64")
                    pall = np.concatenate([ptail, xs])
                    pnn = ~np.isnan(pall)
                    kt = len(ptail)
                    csum = np.concatenate(
                        [[0.0], np.cumsum(np.where(pnn, pall, 0.0))])
                    ncsum = np.concatenate(
                        [[0.0], np.cumsum(pnn.astype("float64"))])
                    endpos = kt + np.arange(1, k + 1)
                    rcnt_i = ps.count + np.arange(1, k + 1)  # phase ROWS
                    wlen = np.minimum(rcnt_i, FORM_WINDOW).astype("int64")
                    nwin = ncsum[endpos] - ncsum[endpos - wlen]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        form_i = np.where(
                            nwin > 0,
                            (csum[endpos] - csum[endpos - wlen])
                            / np.maximum(nwin, 1),
                            np.nan,
                        )
                    # EWMA over the NON-NULL phase subsequence, carried at
                    # null phase rows (== batch ignore_na + forward_fill)
                    xs_nn = xs[nnp]
                    ew_reg_in = ps.ewma
                    z, reg = _ewma_scan(xs_nn, ew_reg_in, EWMA_ALPHA)
                    ecarry = np.nan if ew_reg_in is None else ew_reg_in
                    if len(xs_nn):
                        zp = np.full(k, -1, dtype=np.int64)
                        zp[np.flatnonzero(nnp)] = np.arange(len(xs_nn))
                        incl_nn = np.maximum.accumulate(
                            np.where(nnp, np.arange(k), -1))
                        ew_i = np.where(
                            incl_nn >= 0,
                            z[np.maximum(zp[np.maximum(incl_nn, 0)], 0)],
                            ecarry,
                        )
                    else:
                        reg = ew_reg_in
                        ew_i = np.full(k, ecarry)
                else:
                    xs = avg_i = form_i = ew_i = np.empty(0)
                sel = lpi >= 0
                pj = ppos[np.maximum(lpi, 0)]
                for fam, incl, prev in (
                    ("last", xs, ps.prev_last), ("form", form_i, ps.prev_form),
                    ("avg", avg_i, ps.prev_avg), ("ewma", ew_i, ps.prev_ewma),
                ):
                    # NULL-skip propagation: a NaN inclusive aggregate at a
                    # phase row is transparent (batch ffill / LAST_VALUE
                    # IGNORE NULLS); the shared gather is the no-NaN fast path
                    if k and np.isnan(incl).any():
                        rowarr = np.full(n, np.nan)
                        rowarr[idxs] = incl
                        rowvalid = np.zeros(n, dtype=bool)
                        rowvalid[idxs] = ~np.isnan(incl)
                        hasp, lvi = _last_valid_prior(rowvalid, n)
                        vals = np.where(hasp, rowarr[lvi], prev)
                    else:
                        vals = np.full(n, prev)
                        if k:
                            vals[sel] = incl[pj[sel]]
                    out[f"{fam}_{m}_{ph}"] = vals
                if k:
                    ps.count += k
                    ps.ncount += int(np.sum(nnp))
                    ps.csum += float(np.sum(xcs))
                    ps.ewma = reg
                    ps.tail = list(pall[-FORM_WINDOW:])
                    for fam, incl in (("last", xs), ("form", form_i),
                                      ("avg", avg_i), ("ewma", ew_i)):
                        good = np.flatnonzero(~np.isnan(incl))
                        if len(good):
                            setattr(ps, f"prev_{fam}", float(incl[good[-1]]))

            # update registers + tail (count register = NON-NULL rows)
            ms.total += float(np.sum(xc))
            ms.count += int(np.sum(nn))
            ms.tail = list(allv[-_TAIL:])

        # --- commit conv-level state
        s.turns += n
        s.prev_ts = pd.Timestamp(ts[-1])
        s.watermark = pd.Timestamp(ts[-1])
        s.session_id = int(sess_ids[-1])
        s.sess_turn = int(sti[-1]) + 1
        for r in ("user", "assistant", "tool"):
            s.n_role[r] += int(np.sum(role == r))
        tool_idx = np.flatnonzero(is_tool)
        if len(tool_idx):
            s.last_tool_pos = int(pos[tool_idx[-1]])
            s.last_tool_ts = pd.Timestamp(ts[tool_idx[-1]])
        s.tool_ring = list(
            np.concatenate([np.asarray(s.tool_ring, dtype="float64"), is_tool.astype("float64")])[
                -COVER_WINDOW:
            ]
        )
        return out


def _rolling_shifted_with_prefix(
    allv: np.ndarray, prefix_len: int, n: int, window: int, turns_before: int
) -> np.ndarray:
    """mean of the NON-NULL values among up to `window` strictly-prior
    rows, where `allv` holds prefix_len carried tail values followed by
    the n batch values, and the conversation already saw `turns_before`
    rows total. NULL when the window holds no non-null value (SQL AVG)."""
    nn = ~np.isnan(allv)
    cs = np.concatenate([[0.0], np.cumsum(np.where(nn, allv, 0.0))])
    ncs = np.concatenate([[0.0], np.cumsum(nn.astype("float64"))])
    for_i = np.arange(n)
    glob = turns_before + for_i  # global position of each batch row
    hi = prefix_len + for_i  # allv index one past the last prior value
    avail = np.minimum(glob, window)  # how many prior rows the window has
    # the tail always contains >= min(glob, _TAIL) >= avail values
    lo = hi - avail
    nwin = ncs[hi] - ncs[lo]  # non-null rows among them
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(nwin > 0, (cs[hi] - cs[lo]) / np.maximum(nwin, 1), np.nan)
    return out


def _last_valid_prior(valid: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(has-prior, index) of the last ``valid`` row STRICTLY before each
    of the n rows (in-batch; -1 -> carry the register)."""
    marker = np.where(valid, np.arange(n), -1)
    incl = np.maximum.accumulate(marker)
    lpi = np.empty(n, dtype=np.int64)
    if n:
        lpi[0] = -1
        lpi[1:] = incl[:-1]
    return lpi >= 0, np.maximum(lpi, 0)
