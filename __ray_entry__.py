"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full point-in-time window-feature materialization
    over the transcript table derived from sf0.001 events (lag / rolling /
    expanding / session-seeded expanding / EWMA / sessionization / role
    counts / tool lags), one row per turn."""
    from nfl_feature_store_ray.sources import transcripts_from_events
    from nfl_feature_store_ray.state import window_features

    ts = transcripts_from_events("/root/testdata/sf0.001")
    return window_features(
        ts, metrics=("value", "text_len", "n_tokens"), assign_turn_idx=True
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from nfl_feature_store_ray.pipelines.registry import all_queries

    return all_queries()[0]


def oracle_sql() -> dict[str, str]:
    from nfl_feature_store_ray.pipelines.registry import all_queries

    return all_queries()[1]
