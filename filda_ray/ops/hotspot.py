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
import pandas as pd
import pyarrow as pa

from ..kernels import cells


def cell_counts(ds, cell_col: str = "hex_r7"):
    """Per-cell row counts: vectorized partial counts per batch
    (np.unique, one row per distinct cell per batch) merged by a
    distributed ``groupby.aggregate(Sum)`` — the driver only ever sees
    the final table (one row per occupied cell), never the
    #batches x #distinct-cells partials.  Returns (sorted_keys,
    counts) numpy arrays for broadcast gathering.
    """

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(cell_col).to_numpy(zero_copy_only=False)
        u, n = np.unique(c, return_counts=True)
        return pa.table({cell_col: pa.array(u), "n": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (
        ds.select_columns([cell_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(cell_col)
        .aggregate(Sum("n", alias_name="n"))
    )
    batches = list(agg.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches or sum(len(b) for b in batches) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    tbl = pa.concat_tables(batches)
    keys = tbl.column(cell_col).to_numpy()
    vals = tbl.column("n").to_numpy().astype(np.int64)
    order = np.argsort(keys)
    return keys[order], vals[order]


def count_in_cell(ds, cell_col: str = "hex_r7", out_col: str = "n_in_cell",
                  counts_from=None):
    """Per-row count of rows sharing its cell (FP_Num_Fire analog,
    FILDA.py:1487-1497 — reproduced as counts + gather, never O(n^2)).

    ``counts_from`` lets callers count an UPSTREAM dataset (e.g. the
    pre-classification stream) so the pipeline stays single-pass.
    The counts table is broadcast (ray.put) and gathered per batch by
    searchsorted; for runs where occupied cells outgrow the object
    store, swap the broadcast for ``relational.hash_join``.
    """
    import ray

    from .workercache import worker_state

    keys, vals = cell_counts(counts_from if counts_from is not None else ds, cell_col)
    ref = ray.put((keys, vals))

    def gather(batch: pa.Table) -> pa.Table:
        kk, vv = worker_state(ref, lambda: ray.get(ref))
        c = batch.column(cell_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(kk, c)
        idx = np.clip(idx, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[idx] == c)
        n = np.where(hit, vv[idx], 0)
        return batch.append_column(out_col, pa.array(n.astype(np.int32)))

    return ds.map_batches(gather, batch_format="pyarrow")


def knn_hotspots(ds, *, k_ring: int = 1, cell_col: str = "hex_r7",
                 out_col: str = "n_kring", prefix_shift: int = 5):
    """Per-row count of rows within ``k_ring`` hex cells — EXACT across
    partition boundaries via halo exchange:

    1. reduce rows to (cell, count) — per-batch partials, one small
       groupby shuffle (cardinality = occupied cells, not rows);
    2. emit each (cell, count) to the prefix block of every cell in
       its k-ring ('halo': a boundary cell is visible to adjacent
       blocks; duplication factor ~ block perimeter / area);
    3. per-prefix vectorized neighbor-sum for OWNED cells only;
    4. gather n_kring back onto rows by cell id (broadcast; swap for a
       hash join when occupied-cell cardinality outgrows the object
       store).

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

    counts = (
        ds.select_columns([cell_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
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

    nk = halo.groupby("pfx").map_groups(per_prefix, batch_format="pandas")
    nk_tbl = pa.concat_tables(list(nk.iter_batches(batch_format="pyarrow", batch_size=None)))
    keys = nk_tbl.column("cell").to_numpy()
    vals = nk_tbl.column(out_col).to_numpy()
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    def gather(batch: pa.Table) -> pa.Table:
        kk, vv = worker_state(ref, lambda: ray.get(ref))
        c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.searchsorted(kk, c)
        idx = np.clip(idx, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[idx] == c)
        return batch.append_column(out_col, pa.array(np.where(hit, vv[idx], 0).astype(np.int32)))

    return ds.map_batches(gather, batch_format="pyarrow")
