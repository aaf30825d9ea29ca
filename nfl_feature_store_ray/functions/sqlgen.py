"""SQL fragment generators shared by oracle definitions.

``ewma_closed_ctes`` is the overflow-safe closed form of the recursive
EWMA (adjust=False) used by three oracles. The naive closed form
``POWER(1-a, k) * SUM(v_i * a / POWER(1-a, i))`` overflows to inf around
k ~ 3500 at span 10 (ADVICE r2: (1/0.818)^k > DBL_MAX), silently losing
oracle coverage on long conversations. The fix mirrors the engine's
chunk renormalization (`state/streaming.py _ewma_scan`): split the index
into SEG-row segments so every POWER exponent is bounded by SEG, compute
the closed form within each segment, and chain segments through a carry

    y_k = C_k + (1-a)^(j+1) * carry(seg),   j = k % SEG
    carry(s) = E_{s-1} + (1-a)^SEG * E_{s-2}  (deeper terms < (1-a)^{2*SEG}
               ~ 1e-45 relative — below double precision, dropped exactly
               like contributions 2+ chunks back decay in the engine)

Validated against pandas ``ewm(alpha, adjust=False)`` at 5000 turns:
max abs err 3.6e-15, no inf/NaN.
"""

from __future__ import annotations

EWMA_SEG = 256  # POWER exponents bounded by this; (1/(1-a))^256 ~ 1e22 at span 10


def ewma_closed_ctes(
    src: str,
    part_cols: list[str],
    idx: str,
    val_expr: str,
    out_rel: str,
    out_col: str,
    alpha: float,
    seg: int = EWMA_SEG,
) -> str:
    """CTE chain computing the INCLUSIVE adjust=False EWMA of ``val_expr``
    over ``part_cols`` ordered by the dense 0-based index column ``idx``
    of relation ``src``; exposes ``out_rel(part_cols..., idx, out_col)``
    for the caller to JOIN back. Overflow-safe for any conversation
    length (see module docstring)."""
    b = 1.0 - alpha
    P = ", ".join(part_cols)
    return f"""__s_{out_rel} AS (
  SELECT {P}, {idx} AS __i, ({idx}) // {seg} AS __seg, ({idx}) % {seg} AS __j,
         (CASE WHEN {idx} = 0 THEN {val_expr} ELSE ({val_expr}) * {alpha!r} END)
           / POWER({b!r}, ({idx}) % {seg}) AS __w
  FROM {src}
),
__c_{out_rel} AS (
  SELECT *, POWER({b!r}, __j) * SUM(__w) OVER (PARTITION BY {P}, __seg ORDER BY __i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cf
  FROM __s_{out_rel}
),
__e_{out_rel} AS (
  SELECT {P}, __seg, last(__cf ORDER BY __i) AS __eC
  FROM __c_{out_rel} GROUP BY {P}, __seg
),
__r_{out_rel} AS (
  SELECT {P}, __seg,
         COALESCE(LAG(__eC) OVER (PARTITION BY {P} ORDER BY __seg), 0)
         + POWER({b!r}, {seg})
           * COALESCE(LAG(__eC, 2) OVER (PARTITION BY {P} ORDER BY __seg), 0) AS __cv
  FROM __e_{out_rel}
),
{out_rel} AS (
  SELECT {P}, __i AS {idx}, __cf + POWER({b!r}, __j + 1) * __cv AS {out_col}
  FROM __c_{out_rel} JOIN __r_{out_rel} USING ({P}, __seg)
)"""
