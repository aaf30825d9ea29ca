"""Named NaN-fill policy: fill 0 everywhere EXCEPT an exempt list.

Reference: M11 (SURVEY §2.2) — the pump fills NaN with 0 for every stat
column except the EPA-like metrics (`passing_epa, rushing_epa, ...,
dakota, racr, target_share, air_yards_share, wopr, pacr`), which keep NaN
(`/root/reference/src/pumps/player_game.py:196-202,312-323,460-467,525-535`).
The rebuild makes this a single named, reusable policy instead of four
inlined copies; allclose parity depends on it (null vs 0 differ).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def fill_zero_except(
    ds: ray.data.Dataset,
    exempt: tuple[str, ...] = (),
    key_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Fill nulls with 0 in every numeric column not in ``exempt``/``key_cols``."""
    exempt_set = set(exempt) | set(key_cols)

    def fill(batch: pa.Table) -> pa.Table:
        arrays, names = [], []
        for field in batch.schema:
            col = batch[field.name]
            if field.name not in exempt_set and pa.types.is_floating(field.type):
                col = pc.fill_null(col, 0.0)
            elif field.name not in exempt_set and pa.types.is_integer(field.type):
                col = pc.fill_null(col, 0)
            names.append(field.name)
            arrays.append(col)
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
