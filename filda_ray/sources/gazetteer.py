"""Gazetteer side table: host -> (lat, lon, country).

Reference analog: the NTL climatology / static tile lookups loaded
once and indexed per pixel (FILDA_CLT.py:12-116; SURVEY.md T1) — the
prototypical broadcast small side of a join.  Here the side table maps
url hosts to coordinates; it is built deterministically from the same
integer arithmetic as ``sources.pages`` (so SQL oracles can inline
it), then broadcast once via ``ray.put`` and consumed inside
map_batches actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..ops import autoscale

from . import pages as P


def build_gazetteer(n_hosts: int = P.N_HOSTS) -> pa.Table:
    host_id = np.arange(n_hosts, dtype=np.int64)
    lat = P.host_lat(host_id)
    lon = P.host_lon(host_id)
    host = np.array([f"host{h:04d}.example.com" for h in host_id], dtype=object)
    # country = admin grid cell name (see sources.polygons)
    from .polygons import admin_id_analytic

    country = np.array([f"A{int(a):02d}" for a in admin_id_analytic(lat, lon)], dtype=object)
    return pa.table(
        {
            "host_id": pa.array(host_id),
            "host": pa.array(host, pa.string()),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
            "country": pa.array(country, pa.string()),
        }
    )


class GazetteerLookup:
    """Actor-pool stage: geocode pages by host.

    State (the gazetteer arrays) is resolved ONCE per actor in
    __init__ from an object-store ref (``ray.put`` broadcast — shipped
    to each node once, not per batch); __call__ is a vectorized
    integer-index gather, mirroring the reference's
    compute-index-then-fancy-index joins (FILDA_CLT.py:112-114).
    """

    def __init__(self, gaz_ref):
        import ray

        gaz: pa.Table = ray.get(gaz_ref) if not isinstance(gaz_ref, pa.Table) else gaz_ref
        self.lat = gaz.column("lat").to_numpy()
        self.lon = gaz.column("lon").to_numpy()
        self.country = np.asarray(gaz.column("country").to_pylist(), dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized host parse: url layout https://host{NNNN}.example.com/...
        host_id = pc.cast(
            pc.utf8_slice_codeunits(batch.column("url"), 12, 16), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ok = (host_id >= 0) & (host_id < len(self.lat))
        idx = np.where(ok, host_id, 0)
        lat = np.where(ok, self.lat[idx], np.nan)
        lon = np.where(ok, self.lon[idx], np.nan)
        country = np.where(ok, self.country[idx], None)
        return (
            batch.append_column("host_id", pa.array(host_id, pa.int64()))
            .append_column("lat", pa.array(lat, pa.float64()))
            .append_column("lon", pa.array(lon, pa.float64()))
            .append_column("country", pa.array(country, pa.string()))
        )


def geocode(ds, gaz_ref=None, *, concurrency: int | None = None,
            batch_size: int | None = None):
    """Dataset op: pages -> pages + (host_id, lat, lon, country).

    Default: stateless tasks with the gazetteer fetched once per
    worker process (broadcast ``ray.put`` + worker_state cache —
    elastic, no pool spin-up).  Pass ``concurrency`` to force an
    explicit actor pool instead (same class, same results).
    """
    import ray

    from ..ops.workercache import worker_state

    if gaz_ref is None:
        gaz_ref = ray.put(build_gazetteer())
    if concurrency is not None:
        return ds.map_batches(
            GazetteerLookup,
            fn_constructor_args=(gaz_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=autoscale(concurrency),
        )

    def fn(batch: pa.Table) -> pa.Table:
        lookup = worker_state(gaz_ref, lambda: GazetteerLookup(gaz_ref))
        return lookup(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
