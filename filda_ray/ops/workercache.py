"""Per-worker-process state cache for task-based stages.

Two ways to run a stateful stage in Ray Data:

1. actor pool (``map_batches(Cls, concurrency=...)``) — right when
   state is expensive (compiled models, big indexes): pool size is
   explicit, state lives exactly once per actor.
2. stateless tasks + per-worker cache (this module) — right when
   state is cheap to fetch/build (a broadcast ``ray.put`` table, a
   small polygon index): tasks scale elastically with the executor,
   no pool spin-up latency, and Ray's worker-process reuse means the
   builder still runs once per worker, not once per batch.

The flagship pipeline uses (2) for its broadcast-join stages after
profiling showed fixed actor-pool startup dominating wall time at
bench scale; the estimator (``ops.score``) keeps (1).
"""

from __future__ import annotations

_CACHE: dict = {}
_MAX_ENTRIES = 8  # bound per-worker memory across many pipelines


def worker_state(key, builder):
    """Build-once-per-worker-process state.  ``key`` must be hashable
    (an ObjectRef works and ties cache lifetime to the run's ref).
    LRU-bounded so long sessions don't pin stale broadcast objects."""
    st = _CACHE.pop(key, None)
    if st is None:
        st = builder()
    _CACHE[key] = st  # reinsert = most-recently-used
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.pop(next(iter(_CACHE)))
    return st
