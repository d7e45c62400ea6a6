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
    """Per-cell row counts WITHOUT an all-to-all: vectorized partial
    counts per batch (np.unique) -> tiny per-batch tables -> one
    driver-side merge.  The merged table is one row per occupied cell
    (bounded by #distinct locations, orders of magnitude below row
    count).  Returns (sorted_keys, counts) numpy arrays.
    """

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(cell_col).to_numpy(zero_copy_only=False)
        u, n = np.unique(c, return_counts=True)
        return pa.table({cell_col: pa.array(u), "n": pa.array(n.astype(np.int64))})

    parts = ds.select_columns([cell_col]).map_batches(partial, batch_format="pyarrow")
    df = parts.to_pandas()  # small: one row per (batch, distinct cell)
    if df.empty:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    agg = df.groupby(cell_col, sort=True)["n"].sum()
    return agg.index.to_numpy(), agg.to_numpy()


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


def knn_hotspots(ds, *, k_ring: int = 1, prefix_col: str = "hex_prefix",
                 cell_col: str = "hex_r7", out_col: str = "n_kring"):
    """Per-row count of rows within ``k_ring`` hex cells, computed
    per-prefix (groupby(prefix).map_groups — the shuffle key is the
    coarse partition prefix, so each group holds one spatial block).

    Edge note: neighbors across a prefix boundary are missed by design
    at this altitude (prefix blocks are 32x32 hexes vs k_ring<=2);
    the background op handles cross-tile neighborhoods exactly where
    it matters.  Documented partitioning assumption per SURVEY §2
    custom-operator rules.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        cellv = g[cell_col].to_numpy().astype(np.uint64)
        uniq, inv, ucnt = np.unique(cellv, return_inverse=True, return_counts=True)
        disk = cells.hex_disk(uniq, k_ring)  # (u, m)
        # neighbor count per unique cell = sum of counts of neighbor cells present
        order = np.argsort(uniq)
        su, sc = uniq[order], ucnt[order]
        idx = np.searchsorted(su, disk)
        idx = np.clip(idx, 0, len(su) - 1)
        hit = su[idx] == disk
        ncnt = np.where(hit, sc[idx], 0).sum(axis=1)
        g = g.copy()
        g[out_col] = ncnt[inv].astype(np.int32)
        return g

    return ds.groupby(prefix_col).map_groups(per_group, batch_format="pandas")
