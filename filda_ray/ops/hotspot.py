"""Per-tile clustering / hotspot aggregation.

Reference analogs:
- FP_Num_Fire duplicate count — O(n^2) loop in the reference
  (FILDA.py:1487-1497); engine reproduces the *result* as
  groupby(cell).count joined back (SURVEY.md §2.5 A5).
- adjacency counts gen_AdjWater/Cloud (FILDA.py:2179-2254) — k-ring
  neighbor counts.
- kNN hotspot clustering per tile (north_star): per-point neighbor
  count within a hex k-ring, computed inside per-prefix groups.
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
import pandas as pd
import pyarrow as pa

from ..kernels import cells


BROADCAST_MAX_CELLS = 2_000_000  # ~one 56-byte row per occupied cell


def cell_counts_ds(ds, cell_col: str = "hex_r7"):
    """Per-cell row counts as a DATASET: vectorized partial counts per
    batch (np.unique, one row per distinct cell per batch) merged by a
    distributed ``groupby.aggregate(Sum)`` — cardinality = occupied
    cells, not rows."""

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(cell_col).to_numpy(zero_copy_only=False)
        u, n = np.unique(c, return_counts=True)
        return pa.table({cell_col: pa.array(u), "n": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    return (
        ds.select_columns([cell_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=HIST_BATCH_ROWS)
        .groupby(cell_col, num_partitions=shuffle_partitions())
        .aggregate(Sum("n", alias_name="n"))
    )


def _collect_sorted_kv(agg, key_col: str, val_col: str, key_dtype=None):
    """(sorted keys, values) numpy arrays from a small keyed Dataset.

    ``key_dtype``: restore the source key dtype — Ray's hash aggregate
    widens uint64 keys to int64, and a later mixed int64-vs-uint64
    searchsorted silently promotes BOTH to float64, which cannot
    resolve adjacent hex ids at 2^59 magnitude (observed: misses on
    every boundary cell)."""
    empty_t = key_dtype or np.uint64
    batches = list(agg.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches or sum(len(b) for b in batches) == 0:
        return np.empty(0, dtype=empty_t), np.empty(0, dtype=np.int64)
    tbl = pa.concat_tables(batches)
    keys = tbl.column(key_col).to_numpy()
    if key_dtype is not None:
        keys = keys.astype(key_dtype, copy=False)
    vals = tbl.column(val_col).to_numpy().astype(np.int64)
    order = np.argsort(keys)
    return keys[order], vals[order]


def _np_key_dtype(ds, col: str):
    """numpy dtype of ``col`` in the dataset's schema (None if unknown)."""
    try:
        sch = ds.schema()
        return dict(zip(sch.names, sch.types))[col].to_pandas_dtype()
    except Exception:
        return None


def cell_counts(ds, cell_col: str = "hex_r7"):
    """Driver-side (sorted_keys, counts) arrays for broadcast gathering
    — only for cell tables known to fit the driver/object store."""
    return _collect_sorted_kv(cell_counts_ds(ds, cell_col), cell_col, "n",
                              key_dtype=_np_key_dtype(ds, cell_col))


def _join_counts_back(ds, agg, *, cell_col: str, agg_key: str, agg_val: str,
                      out_col: str):
    """Hash-join per-cell values back onto rows, misses -> 0 (int32).
    The scale path when occupied-cell cardinality outgrows a broadcast."""
    import pyarrow.compute as pc

    from . import derive_buckets
    from .relational import hash_join

    # the groupby aggregate may widen/normalize the key dtype (uint64 ->
    # int64); Acero requires identical key types on both join sides
    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[cell_col]

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({agg_key: b.column(agg_key).cast(key_type),
                         "__cnt": b.column(agg_val).cast(pa.int64())})

    side = agg.map_batches(prep, batch_format="pyarrow")
    joined = hash_join(ds, side, on=cell_col,
                       right_on=agg_key if agg_key != cell_col else None,
                       how="left_outer", num_partitions=derive_buckets(ds))

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(b.column("__cnt"), 0), pa.int32())
        drop = [c for c in ("__cnt", agg_key) if c in b.column_names and c != cell_col]
        return b.drop_columns(drop).append_column(out_col, n)

    return joined.map_batches(finish, batch_format="pyarrow")


def count_in_cell(ds, cell_col: str = "hex_r7", out_col: str = "n_in_cell",
                  counts_from=None, mode: str = "auto",
                  broadcast_max_cells: int = BROADCAST_MAX_CELLS):
    """Per-row count of rows sharing its cell (FP_Num_Fire analog,
    FILDA.py:1487-1497 — reproduced as counts + gather, never O(n^2)).

    ``counts_from`` lets callers count an UPSTREAM dataset (e.g. the
    pre-classification stream) so the pipeline stays single-pass.
    Mode is chosen by MEASURED occupied-cell cardinality: ``broadcast``
    (ray.put the counts once, searchsorted per batch — zero shuffle of
    the page stream) up to ``broadcast_max_cells``; ``join`` (hash join
    on the cell id — planetary cell counts, e.g. global res-7 with
    10^7-10^8 occupied cells, where the broadcast would be GBs) above.
    """
    import ray

    from .workercache import worker_state

    agg = cell_counts_ds(counts_from if counts_from is not None else ds,
                         cell_col).materialize()
    if mode == "auto":
        mode = "broadcast" if agg.count() <= broadcast_max_cells else "join"

    if mode == "join":
        return _join_counts_back(ds, agg, cell_col=cell_col, agg_key=cell_col,
                                 agg_val="n", out_col=out_col)

    # key dtype is restored lazily per worker on the FIRST batch: a
    # driver-side ds.schema() probe on a lazy map chain EXECUTES part
    # of the pipeline (measured 2.7 s on the flagship detect stream)
    keys, vals = _collect_sorted_kv(agg, cell_col, "n")
    ref = ray.put((keys, vals))

    def gather(batch: pa.Table) -> pa.Table:
        st = worker_state(ref, lambda: {"kv": ray.get(ref)})
        kk, vv = st["kv"]
        c = batch.column(cell_col).to_numpy(zero_copy_only=False)
        if kk.dtype != c.dtype:
            # mixed int64/uint64 searchsorted silently promotes to
            # float64, which cannot resolve adjacent hex ids — cast
            # (and re-sort, in case the cast reorders) once per worker
            kk2 = kk.astype(c.dtype, copy=False)
            order = np.argsort(kk2, kind="stable")
            kk, vv = kk2[order], vv[order]
            st["kv"] = (kk, vv)
        idx = np.searchsorted(kk, c)
        idx = np.clip(idx, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[idx] == c)
        n = np.where(hit, vv[idx], 0)
        return batch.append_column(out_col, pa.array(n.astype(np.int32)))

    return ds.map_batches(gather, batch_format="pyarrow")


def knn_hotspots(ds, *, k_ring: int = 1, cell_col: str = "hex_r7",
                 out_col: str = "n_kring", prefix_shift: int = 5,
                 mode: str = "auto",
                 broadcast_max_cells: int = BROADCAST_MAX_CELLS):
    """Per-row count of rows within ``k_ring`` hex cells — EXACT across
    partition boundaries via halo exchange:

    1. reduce rows to (cell, count) — per-batch partials, one small
       groupby shuffle (cardinality = occupied cells, not rows);
    2. emit each (cell, count) to the prefix block of every cell in
       its k-ring ('halo': a boundary cell is visible to adjacent
       blocks; duplication factor ~ block perimeter / area);
    3. per-prefix vectorized neighbor-sum for OWNED cells only;
    4. gather n_kring back onto rows by cell id — ``broadcast`` vs
       hash ``join`` chosen by MEASURED occupied-cell cardinality
       (broadcast up to ``broadcast_max_cells``; join above, where a
       planetary res-7 table would make the broadcast GBs).

    Partitioning assumption (documented per SURVEY §2 custom-op
    rules): k_ring hexes never span more than adjacent prefix blocks,
    i.e. k_ring < 2^prefix_shift.
    """
    import ray

    from .workercache import worker_state

    assert k_ring < (1 << prefix_shift)

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u, pa.uint64()),
                         "n": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    counts = (
        ds.select_columns([cell_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=HIST_BATCH_ROWS)
        .groupby("cell", num_partitions=shuffle_partitions())
        .aggregate(Sum("n", alias_name="n"))
    )

    def halo_emit(batch: pa.Table) -> pa.Table:
        c = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        disk = cells.hex_disk(c, k_ring)            # (rows, m)
        pfx = cells.hex_prefix(disk.ravel(), prefix_shift).reshape(disk.shape)
        own = cells.hex_prefix(c, prefix_shift)
        m = disk.shape[1]
        # distinct prefixes per row (m small: 7 or 19)
        flat = cells.rowwise_first_occurrence_mask(pfx).ravel()
        cc = np.repeat(c, m)[flat]
        nn = np.repeat(n, m)[flat]
        pp = pfx.ravel()[flat]
        oo = np.repeat(own, m)[flat] == pp
        return pa.table(
            {"cell": pa.array(cc, pa.uint64()), "n": pa.array(nn),
             "pfx": pa.array(pp, pa.uint32()), "owned": pa.array(oo)}
        )

    halo = counts.map_batches(halo_emit, batch_format="pyarrow")

    def per_prefix(g: pd.DataFrame) -> pd.DataFrame:
        cellv = g["cell"].to_numpy().astype(np.uint64)
        nv = g["n"].to_numpy().astype(np.int64)
        owned = g["owned"].to_numpy().astype(bool)
        order = np.argsort(cellv, kind="mergesort")
        su, sn = cellv[order], nv[order]
        oc = cellv[owned]
        disk = cells.hex_disk(oc, k_ring)
        idx = np.searchsorted(su, disk)
        idx = np.clip(idx, 0, max(len(su) - 1, 0))
        hit = (len(su) > 0) & (su[idx] == disk)
        total = np.where(hit, sn[idx], 0).sum(axis=1)
        return pd.DataFrame({"cell": oc, out_col: total.astype(np.int64)})

    nk = halo.groupby("pfx", num_partitions=shuffle_partitions()).map_groups(per_prefix, batch_format="pandas").materialize()
    if mode == "auto":
        mode = "broadcast" if nk.count() <= broadcast_max_cells else "join"
    if mode == "join":
        return _join_counts_back(ds, nk, cell_col=cell_col, agg_key="cell",
                                 agg_val=out_col, out_col=out_col)
    keys, vals = _collect_sorted_kv(nk, "cell", out_col, key_dtype=np.uint64)
    ref = ray.put((keys, vals))

    def gather(batch: pa.Table) -> pa.Table:
        kk, vv = worker_state(ref, lambda: ray.get(ref))
        c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.searchsorted(kk, c)
        idx = np.clip(idx, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[idx] == c)
        return batch.append_column(out_col, pa.array(np.where(hit, vv[idx], 0).astype(np.int32)))

    return ds.map_batches(gather, batch_format="pyarrow")


def radius_join(ds, *, query_lat, query_lon, query_ids=None,
                radius_km: float, lat_col: str = "lat",
                lon_col: str = "lon", keep_cols: list[str] | None = None):
    """Point-radius spatial join: every (row, query-point) pair within
    ``radius_km`` great-circle distance, with the exact haversine
    distance attached.  Output: keep_cols + (query_id, dist_km).

    Scale design: each query point's radius inflates to a lat/lon bbox
    whose PC tile cover (kernels.cells.bbox_tiles — the get_tiles
    planner) unions into ONE broadcast prefilter; rows outside every
    cover are dropped by an int `isin` before the O(survivors x Q)
    exact haversine runs.  Q (query count) is assumed broadcast-small;
    for large Q, bucket queries by tile and hash-join on tile instead
    — the same swap documented on the occupied-cell gathers.

    Reference analog: static-layer mosaic restricted to the granule
    bbox (FILDA_CLT.py:88-110) + per-pixel distance thresholding.
    """
    from ..kernels.geo import haversine_km

    qlat = np.asarray(query_lat, dtype=np.float64)
    qlon = np.asarray(query_lon, dtype=np.float64)
    qids = (np.arange(len(qlat), dtype=np.int64) if query_ids is None
            else np.asarray(query_ids, dtype=np.int64))
    # radius -> degrees: 1 deg lat ~ 111.19 km; lon shrinks by cos(lat)
    dlat = radius_km / 111.19
    covers = []
    for la, lo in zip(qlat, qlon):
        coslat = max(np.cos(np.deg2rad(min(abs(la) + dlat, 89.9))), 1e-6)
        dlon = radius_km / (111.19 * coslat)
        if dlon >= 180.0:
            # radius circles the pole / spans every longitude: wrapping
            # both endpoints would COLLAPSE the cover to one column
            lo0, lo1 = -180.0, 180.0
        else:
            lo0, lo1 = lo - dlon, lo + dlon
            if lo0 < -180.0:
                lo0 += 360.0  # antimeridian wrap (bbox_tiles handles lo0>lo1)
            if lo1 > 180.0:
                lo1 -= 360.0
        covers.append(cells.bbox_tiles(max(la - dlat, -90.0),
                                       min(la + dlat, 90.0), lo0, lo1))
    cover = np.unique(np.concatenate(covers))

    def f(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy()
        lon = b.column(lon_col).to_numpy()
        pre = np.isin(cells.pc_tile(lat, lon), cover)
        cols = keep_cols or [c for c in b.column_names
                             if c not in (lat_col, lon_col)]
        idx = np.flatnonzero(pre)
        if len(idx):
            d = haversine_km(lat[idx][:, None], lon[idx][:, None],
                             qlat[None, :], qlon[None, :])
            ii, jj = np.nonzero(d <= radius_km)
        else:
            ii = jj = np.array([], dtype=np.int64)
        take = pa.array(idx[ii])
        out = {c: b.column(c).take(take) for c in cols}
        out[lat_col] = pa.array(lat[idx[ii]])
        out[lon_col] = pa.array(lon[idx[ii]])
        out["query_id"] = pa.array(qids[jj])
        out["dist_km"] = pa.array(d[ii, jj] if len(idx) else
                                  np.array([], dtype=np.float64))
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def nearest_point_join(ds, *, query_lat, query_lon, query_ids=None,
                       lat_col: str = "lat", lon_col: str = "lon",
                       keep_cols: list[str] | None = None,
                       max_km: float | None = None):
    """For each row, the NEAREST point of a broadcast candidate set
    (spatial kNN, k=1) with its great-circle distance; ties break to
    the smallest candidate id.  ``max_km`` drops rows with no
    candidate in range.  Output: keep_cols + (nearest_id, dist_km).

    Scale design: the candidate set is broadcast-small (a gazetteer of
    cities/sites); data rows never shuffle — one vectorized
    O(batch x Q) haversine + argmin per batch.  For candidate sets too
    large to broadcast, partition candidates by cell and hash-join
    rows on a k-ring cell cover instead (the same swap documented on
    the occupied-cell gathers).

    Reference analog: nearest-in-time/space static-layer selection
    (MCBEF_IO.py:210's nearest 8-day period, generalized to space).
    """
    from ..kernels.geo import haversine_km

    qlat = np.asarray(query_lat, dtype=np.float64)
    qlon = np.asarray(query_lon, dtype=np.float64)
    qids = (np.arange(len(qlat), dtype=np.int64) if query_ids is None
            else np.asarray(query_ids, dtype=np.int64))
    order = np.argsort(qids, kind="stable")  # argmin tie -> smallest id
    qlat, qlon, qids = qlat[order], qlon[order], qids[order]

    def f(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy()
        lon = b.column(lon_col).to_numpy()
        d = haversine_km(lat[:, None], lon[:, None],
                         qlat[None, :], qlon[None, :])
        j = np.argmin(d, axis=1)
        m = d[np.arange(len(lat)), j]
        cols = keep_cols or [c for c in b.column_names
                             if c not in (lat_col, lon_col)]
        if max_km is not None:
            keep = m <= max_km
            take = pa.array(np.flatnonzero(keep))
            out = {c: b.column(c).take(take) for c in cols}
            out[lat_col] = pa.array(lat[keep])
            out[lon_col] = pa.array(lon[keep])
            out["nearest_id"] = pa.array(qids[j[keep]])
            out["dist_km"] = pa.array(m[keep])
        else:
            out = {c: b.column(c) for c in cols}
            out[lat_col] = pa.array(lat)
            out[lon_col] = pa.array(lon)
            out["nearest_id"] = pa.array(qids[j])
            out["dist_km"] = pa.array(m)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def hotspot_clusters(ds, *, cell_col: str = "hex_r7", min_count: int = 5,
                     k_ring: int = 1):
    """Grid-density clustering (DBSCAN over the hex grid): cells with
    >= ``min_count`` rows are DENSE; dense cells within ``k_ring``
    adjacency connect; clusters = connected components labeled by the
    minimum cell id.  Output: (cell, n, cluster_id), dense cells only.

    Scale design: counts come from the vectorized partial+Sum path
    (cell_counts_ds); the dense set is hotspot-few by construction
    (the min_count filter), so it broadcasts via ``ray.put`` to gate
    edge emission — edges connect dense->dense only, never through a
    sparse cell — and the component loop (ops.graph, large/small-star)
    runs over the dense-adjacency edge table alone.  Reference analog:
    per-cell duplicate-fire counts (FILDA.py:1487-1497, A5) upgraded
    to cross-cell cluster labels.
    """
    import ray

    from .graph import connected_components

    counts = cell_counts_ds(ds, cell_col)

    def dense_only(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(n >= min_count))

    dense = counts.map_batches(dense_only, batch_format="pyarrow").materialize()
    dcells = np.sort(np.concatenate(
        [b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
         for b in dense.iter_batches(batch_format="pyarrow", batch_size=None)]
        or [np.array([], dtype=np.uint64)]))
    if len(dcells) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({cell_col: pa.array([], pa.uint64()),
                                       "n": pa.array([], pa.int64()),
                                       "cluster_id": pa.array([], pa.int64())}))
    dref = ray.put(dcells)

    def edges(b: pa.Table) -> pa.Table:
        dc = ray.get(dref)
        c = b.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        disk = cells.hex_disk(c, k_ring)[:, 1:]  # drop the center
        src = np.repeat(c, disk.shape[1])
        dst = disk.ravel()
        idx = np.searchsorted(dc, dst)
        hit = (idx < len(dc)) & (dc[np.minimum(idx, len(dc) - 1)] == dst)
        return pa.table({"u": pa.array(src[hit].astype(np.int64)),
                         "v": pa.array(dst[hit].astype(np.int64))})

    e = dense.map_batches(edges, batch_format="pyarrow")
    cc = connected_components(e, src="u", dst="v",
                              out_node="__node", out_comp="cluster_id")

    def widen(b: pa.Table) -> pa.Table:
        # int64 key: Ray's hash aggregate widened dense's uint64 key
        # to int64, and Arrow joins refuse mixed-signedness keys
        return pa.table({cell_col: b.column("__node").cast(pa.int64()),
                         "cluster_id": b.column("cluster_id").cast(pa.int64())})

    # labels are dense-cell-bounded -> materializing them is tiny
    lab = cc.map_batches(widen, batch_format="pyarrow").materialize()
    if lab.count() == 0:
        # no adjacent dense cells at all: every dense cell is its own
        # cluster (and Ray's hash join rejects an empty right side)
        def self_label(b: pa.Table) -> pa.Table:
            return pa.table({cell_col: b.column(cell_col).cast(pa.uint64()),
                             "n": b.column("n").cast(pa.int64()),
                             "cluster_id": b.column(cell_col).cast(pa.int64())})

        return dense.map_batches(self_label, batch_format="pyarrow")
    # isolated dense cells never enter the edge table (the component
    # op drops self loops): left join + coalesce to the cell's own id
    j = dense.join(lab, join_type="left_outer", on=(cell_col,),
                   num_partitions=shuffle_partitions())

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.coalesce(b.column("cluster_id"),
                          b.column(cell_col).cast(pa.int64()))
        return pa.table({cell_col: b.column(cell_col).cast(pa.uint64()),
                         "n": b.column("n").cast(pa.int64()),
                         "cluster_id": cid})

    return j.map_batches(fill, batch_format="pyarrow")
