"""Per-worker-process cache for broadcast payloads used by TASK-pool stages.

Pattern: ``ray.put`` the payload once, pass the ObjectRef into a plain
``map_batches`` function, and resolve it through ``cached_get`` — the first
task on each worker deserializes the payload, every later task on that
worker reuses the deserialized object. This keeps the one-copy broadcast
semantics of an actor pool WITHOUT the actor pool: actor spawn costs ~2-3 s
of ramp per query at high concurrency (measured, BASELINE.md round 2),
while tasks reuse the session's warm workers.

The cache holds ONE entry (queries run sequentially per worker; a new ref
evicts the old), so worker heaps stay flat.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_get(ref):
    v = _CACHE.get(ref)
    if v is None:
        import ray

        _CACHE.clear()
        v = ray.get(ref)
        _CACHE[ref] = v
    return v


_DERIVED: dict = {}


def cached_build(ref, builder):
    """Like ``cached_get`` but caches ``builder(payload)`` — for stages that
    derive a worker-local structure (a lookup Series, a normalized matrix)
    from the broadcast payload. One entry, keyed by ref (builder closures
    are recreated per task, so the ref is the stable identity)."""
    v = _DERIVED.get(ref)
    if v is None:
        _DERIVED.clear()
        v = builder(cached_get(ref))
        _DERIVED[ref] = v
    return v
