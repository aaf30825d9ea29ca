"""Half-away-from-zero rounding that matches DuckDB/ANSI-SQL ``ROUND``.

``np.round`` uses banker's rounding (half-to-even).  DuckDB's ``ROUND`` on
DOUBLE is ``std::round(value * 10^nd) / 10^nd`` — half away from zero.  The
two disagree whenever a value lands *exactly* on a 5x10^-(nd+1) tie in binary,
which happens in practice when a 2-decimal sum is divided by a power-of-two
count (expanding windows at count 32/64: e.g. 49.7140625 -> DuckDB 49.714063,
np.round 49.714062).  All round-1 hash failures (w_expanding, w_session_avg,
agg_career) shared this single cause, so every oracle-parity surface must
round through this helper.

``np.copysign(np.floor(np.abs(x)*s + 0.5), x) / s`` reproduces DuckDB's
computation on the same IEEE doubles bit-for-bit (std::round(y) ==
copysign(floor(|y| + 0.5), y) for finite y).  NaN propagates.
"""
from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x, nd: int = 6):
    """Round ``x`` (array-like / Series / scalar) half-away-from-zero to
    ``nd`` decimals, matching DuckDB ``ROUND(x, nd)`` exactly.

    Implemented as floor + exact-fraction compare rather than
    ``floor(|y| + 0.5)``: the ``+ 0.5`` add can itself round up across an
    integer boundary for y within half an ulp below a tie, which would
    diverge from ``std::round``.  ``y - floor(y)`` is exact for |y| < 2^52,
    so the comparison below reproduces ``std::round`` bit-for-bit.
    """
    a = np.asarray(x, dtype="float64")
    scale = 10.0 ** nd
    y = np.abs(a) * scale
    f = np.floor(y)
    mag = np.where(y - f >= 0.5, f + 1.0, f)
    return np.copysign(mag, a) / scale
