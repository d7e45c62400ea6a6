"""Point-in-polygon join stage (actor pool).

Reference analog: static-layer point lookups T2/T4 (land type
FILDA.py:1570-1699, peatland FILDA.py:2034-2144) — re-expressed as a
real polygon join: the polygon layer + its grid bucket index are built
ONCE per actor in __init__ (the layer is the broadcast small side);
__call__ runs vectorized ray-cast PIP per batch.  No shuffle.

At 100 TB the polygon layer stays O(10^4..10^6) geometries — still a
broadcast side; points never move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.polygons import GridIndex, admin_polygons, biome_polygons
from . import autoscale


class PIPJoin:
    def __init__(self, layers: dict[str, list] | None = None):
        layers = layers or {"admin_id": admin_polygons(), "biome_id": biome_polygons()}
        self.indexes = {col: GridIndex(polys) for col, polys in layers.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        # memoize by distinct coordinate (host-level repetition): run
        # the geometric PIP once per unique point, gather by inverse
        pair = np.stack([lat, lon], axis=1)
        uniq, inv = np.unique(pair, axis=0, return_inverse=True)
        ulat, ulon = uniq[:, 0], uniq[:, 1]
        ok = ~(np.isnan(ulat) | np.isnan(ulon))
        out = batch
        for col, idx in self.indexes.items():
            uids = np.full(len(ulat), -1, dtype=np.int32)
            if ok.any():
                uids[ok] = idx.query(ulon[ok], ulat[ok])
            out = out.append_column(col, pa.array(uids[inv], pa.int32()))
        return out


def pip_join(ds, *, concurrency: int | None = None, batch_size: int = 8192):
    """Dataset op: rows with (lat, lon) -> + admin_id, biome_id.

    Default: stateless tasks, polygon grid index built once per worker
    process (worker_state cache — the layers are deterministic code).
    Pass ``concurrency`` for an explicit actor pool (heavy layers)."""
    if concurrency is not None:
        return ds.map_batches(
            PIPJoin, batch_format="pyarrow", batch_size=batch_size,
            concurrency=autoscale(concurrency)
        )

    from .workercache import worker_state
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        st = worker_state("pip_default_layers", PIPJoin)
        return st(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
