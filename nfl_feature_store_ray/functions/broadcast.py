"""Per-worker-process cache for broadcast Python objects.

Plasma zero-copies only numpy/Arrow buffers: a bare per-batch
``ray.get`` of a pickled Python object (frozenset, pandas DataFrame)
re-unpickles the WHOLE object on every batch. Task closures that probe a
``ray.put`` broadcast therefore fetch through this single-entry
per-process cache — one deserialization per worker process, not per
batch. (Single entry: these broadcasts are one-per-query; holding more
would just pin dead objects in worker heaps.)
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_object_get(ref):
    """ray.get(ref), memoized per worker process (single entry)."""
    import ray as _ray

    key = ref.hex()
    v = _CACHE.get(key)
    if v is None:
        v = _ray.get(ref)
        _CACHE.clear()
        _CACHE[key] = v
    return v
