"""Per-stage row-count metrics.

Reference analog: stage count printouts (FILDA.py:301, 311, 392, 399,
454-455, 1920-1921) — here a named counter actor incremented from
pass-through map_batches stages, read out at pipeline end (SURVEY.md
A8 / north_rule 'row-count metrics')."""

from __future__ import annotations

import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, stage: str, n: int):
        self.counts[stage] = self.counts.get(stage, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def reset(self):
        self.counts = {}


_HANDLES: dict[tuple, "ray.actor.ActorHandle"] = {}


def get_metrics_actor(name: str = "filda_metrics"):
    # get_if_exists makes concurrent get-or-create atomic (two stages
    # racing here used to produce a second, orphaned actor whose adds
    # were silently lost).  The handle cache is keyed by the cluster's
    # GCS address, not just the name: a handle cached before a
    # ray.shutdown()/ray.init() cycle belongs to a dead cluster and
    # every submit on it raises — which the fire-and-forget telemetry
    # paths would swallow, silently dropping counters.
    #
    # lifetime="detached" + an explicit namespace decouples the actor
    # from whichever process happened to create it first: the first
    # caller can be a transient map worker (e.g. the first over-cap
    # LSH bucket), and a non-detached actor dies with its owner,
    # taking the accumulated counters with it.  A detached actor
    # lives until ray.shutdown().
    cluster = ray.get_runtime_context().gcs_address if ray.is_initialized() else None
    key = (name, cluster)
    h = _HANDLES.get(key)
    if h is None:
        h = MetricsActor.options(
            name=name, get_if_exists=True, lifetime="detached",
            namespace="filda_ray").remote()
        if cluster is None:
            # the actor creation auto-initialised Ray; re-key so later
            # calls in this cluster hit the cache
            key = (name, ray.get_runtime_context().gcs_address)
        _HANDLES[key] = h
    return h


def count_stage(ds, stage: str, actor=None):
    """Pass-through stage recording row counts per batch (no copy)."""
    actor = actor or get_metrics_actor()

    def f(batch: pa.Table) -> pa.Table:
        actor.add.remote(stage, len(batch))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def snapshot(actor=None) -> dict[str, int]:
    actor = actor or get_metrics_actor()
    return ray.get(actor.snapshot.remote())
