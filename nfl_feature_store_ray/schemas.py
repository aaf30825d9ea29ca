"""Explicit Arrow schemas + engine constants.

The reference (`/root/reference`, theedgepredictor/nfl-feature-store) has no
schema declarations anywhere — dtypes are whatever pandas infers and shipped
files are dtype-inconsistent across stores (SURVEY.md §1.1). The rebuild pins
every logical table to one `pyarrow.Schema` declared here.

Window constants mirror the reference semantics verified empirically in
SURVEY.md §0 (probes 1-8):
  - ``FORM_WINDOW = 3``      rolling-mean window of `form_X` features
                             (reference: rolling(3).mean(min_periods=1),
                             shift 1 — NOT the 5 the stale dictionary claims)
  - ``COVER_WINDOW = 10``    rolling window of 0/1-indicator rate features
                             (reference: `rolling_spread_cover`, rolling(10))
  - ``EWMA_SPAN = 10``       recursive EWMA span (alpha = 2/11, adjust=False;
                             reference `ewma_score_offense/defense`)
  - ``SESSION_GAP_S``        inactivity-gap sessionization threshold; the
                             session is the transcript-domain analogue of the
                             reference's season (epoch with expanding-mean
                             carryover seeding, SURVEY §7.0)
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Window-family constants (reference parity, SURVEY.md §2.6)
# ---------------------------------------------------------------------------
FORM_WINDOW = 3
COVER_WINDOW = 10
EWMA_SPAN = 10
EWMA_ALPHA = 2.0 / (EWMA_SPAN + 1)  # pandas ewm(span=10, adjust=False)
SESSION_GAP_S = 86_400  # 24 h inactivity => new session (epoch boundary)
# Input contract (FIXTURES.md F2): metric columns carry at most 2 decimals
# (`value` is generated as 2-decimal; text_len/n_tokens are integers).
# Expanding/whole-history means sum rint(x * QUANT_SCALE) — exact integers
# in float64 — so the sum is order-independent: the distributed result is
# bit-identical to any serial or SQL engine regardless of partitioning,
# and 5e-7 rounding ties resolve identically on both sides.
QUANT_SCALE = 100.0

# Default number of hash buckets for the conv_id partition spine. At cluster
# scale this should be ~2-4x total cores so that one straggler bucket cannot
# dominate; each bucket must fit in a worker's heap (buckets hold whole
# conversations, never split ones).
DEFAULT_NUM_BUCKETS = 64

# ---------------------------------------------------------------------------
# Logical table schemas
# ---------------------------------------------------------------------------

# Primary engine input (BASELINE.json input_hint, FIXTURES.md F1).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),  # nullable; set on role == 'tool'
        pa.field("ts", pa.timestamp("us")),
    ]
)

ROLES = ("user", "assistant", "tool")

# Per-turn derived columns added by stages.derive (before windowing —
# reference computes derived per-game scalars BEFORE windowing, probe 8).
DERIVED_COLUMNS = (
    "text_len",  # int64: UTF-8 character count
    "n_tokens",  # int64: whitespace token count
    "is_user",
    "is_assistant",
    "is_tool",  # int8 one-hots of role
    "has_tool",  # int8: tool is non-null
)

# Metrics fanned out through the window families (last_/form_/avg_/ewma_).
# Analogue of the reference's 59-base-metric x 3-window-family fan-out
# (SURVEY §1.1 affix algebra) — generated from this list, never hand-written.
DEFAULT_WINDOW_METRICS = ("value", "text_len", "n_tokens")

WINDOW_FAMILIES = ("last", "form", "avg", "ewma")


def window_feature_columns(metrics=DEFAULT_WINDOW_METRICS) -> list[str]:
    """Generated feature-column list (affix algebra, SURVEY §2.6 W1-W5)."""
    cols = [f"{fam}_{m}" for m in metrics for fam in WINDOW_FAMILIES]
    cols += [f"session_avg_{m}" for m in metrics]
    return cols


# Session / structural features emitted by the window engine.
STRUCTURAL_FEATURES = (
    "gap_s",  # float64: seconds since previous turn (lag of ts, W7 'rest')
    "session_id",  # int32: 0-based inactivity-gap session index
    "session_turn_idx",  # int32: 0-based index within session
    "n_prior_user",  # int64: count of strictly-prior 'user' turns
    "n_prior_assistant",
    "n_prior_tool",
    "turns_since_tool",  # float64: turns since last tool turn (NaN if none)
    "secs_since_tool",  # float64: seconds since last tool turn (NaN if none)
    "roll10_tool_rate",  # float64: rolling-10 mean of is_tool, shifted 1 (W6)
)
