"""Per-turn derived columns — stateless, vectorized, zero-copy Arrow.

Reference analogue: the derived per-game scalar metrics family (SURVEY §2.2
M9, `/root/reference/src/pumps/player_game.py:153-157,417-447,538-548`) and
the role/phase one-hot pivot (`_offense`/`_defense` affix algebra). As in the
reference (SURVEY §0 probe 8), derived scalars are computed BEFORE windowing
(avg-of-ratio, not ratio-of-avg).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _derive_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    role = batch["role"]
    out = batch
    out = out.append_column("text_len", pc.cast(pc.utf8_length(pc.coalesce(text, "")), pa.int64()))
    # whitespace token count: count_substring of ' ' + 1 on non-empty strings
    nonempty = pc.greater(pc.utf8_length(pc.coalesce(text, "")), 0)
    spaces = pc.count_substring(pc.coalesce(text, ""), " ")
    n_tokens = pc.if_else(nonempty, pc.add(spaces, 1), pa.scalar(0, pa.int32()))
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    for r in ("user", "assistant", "tool"):
        out = out.append_column(f"is_{r}", pc.cast(pc.equal(role, r), pa.int8()))
    out = out.append_column("has_tool", pc.cast(pc.is_valid(batch["tool"]), pa.int8()))
    return out


def derive_turn_columns(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append text_len / n_tokens / role one-hots / has_tool columns."""
    return ds.map_batches(_derive_batch, batch_format="pyarrow", zero_copy_batch=True)
