"""Pipeline registry — the rebuild's analogue of the reference's
``FEATURE_STORE_METAS`` plugin surface
(`/root/reference/feature_store_runner.py:7-28`): a flat dict of named
pipelines, each a callable ``(sf_dir) -> Dataset | DataFrame | Table``,
paired with a DuckDB oracle SQL string where the semantics are
SQL-expressible (driver correctness gate)."""

from __future__ import annotations

from nfl_feature_store_ray.pipelines import transcript_queries


def _merge(*modules):
    queries, oracles = {}, {}
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(getattr(m, "ORACLES", {}))
    return queries, oracles


def all_queries():
    # imports are strict: a broken pipeline module must FAIL the registry
    # (and hence the driver gate), not silently shrink the query set to a
    # smaller all-green one
    modules = [transcript_queries]
    for name in (
        "agg_queries",
        "dedup",
        "text_analysis",
        "similarity",
        "join_queries",
        "parse_queries",
        "wide",
        "multimodal",
        "resume_queries",
        "packing",
    ):
        mod = __import__(f"nfl_feature_store_ray.pipelines.{name}", fromlist=[name])
        modules.append(mod)
    return _merge(*modules)
