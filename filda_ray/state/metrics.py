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


_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}


def get_metrics_actor(name: str = "filda_metrics"):
    # get_if_exists makes concurrent get-or-create atomic (two stages
    # racing here used to produce a second, orphaned actor whose adds
    # were silently lost).  The handle is cached per process: a named
    # non-detached actor dies as soon as ALL handles are dropped, so a
    # transient `get_metrics_actor().add.remote(...)` call pattern
    # would otherwise kill the actor (and its counters) between calls.
    h = _HANDLES.get(name)
    if h is None:
        h = MetricsActor.options(name=name, get_if_exists=True).remote()
        _HANDLES[name] = h
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
