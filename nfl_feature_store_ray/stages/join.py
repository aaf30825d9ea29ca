"""Generic distributed equi-join.

The reference's fact-fact joins are single-process ``pd.merge`` calls
(`/root/reference/src/pumps/player_game.py:184-188,472-475`). The rebuild
exposes ONE library entry point that uses Ray Data's native hash-shuffle
join operator (``Dataset.join``, hash-partitions both sides on the key and
joins each partition independently — the idiomatic Ray-Data path), with
the partition count as the explicit scale knob: at 100 TB, size
``num_partitions`` so each partition's build side fits a worker's heap.

For joins already riding the conv_id spine, prefer the in-bucket cogroup
(`bucketize.map_conv_buckets` with both sides tagged and unioned — see
`state/asof.py`) which reuses the ONE existing shuffle; this helper is for
standalone fact-fact joins on a fresh key.
"""

from __future__ import annotations

import ray.data

_HOW = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "outer": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    left_suffix: str | None = None,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Distributed hash equi-join of two Datasets.

    ``how`` accepts pandas-style names (inner/left/right/outer/semi/anti).
    Collision handling: colliding non-key columns get ``right_suffix`` on
    the right side (and ``left_suffix`` on the left when given).
    """
    if how not in _HOW:
        raise ValueError(f"unsupported join type: {how!r} (one of {sorted(_HOW)})")
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(
        right,
        join_type=_HOW[how],
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
