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


def count_in_cell(ds, cell_col: str = "hex_r7", out_col: str = "n_in_cell"):
    """groupby(cell).count() joined back by broadcast gather.

    The count table is one row per occupied cell; for web-scale runs
    where that table is itself huge, swap the broadcast for
    ``relational.hash_join`` on the cell key — same op contract.
    """
    import ray

    counts = ds.groupby(cell_col).count()
    tbl = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    ref = ray.put(tbl)

    class Gather:
        def __init__(self):
            t = ray.get(ref)
            keys = t.column(cell_col).to_numpy()
            vals = t.column("count()").to_numpy()
            order = np.argsort(keys)
            self.keys = keys[order]
            self.vals = vals[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            c = batch.column(cell_col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.keys, c)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            n = np.where(self.keys[idx] == c, self.vals[idx], 0)
            return batch.append_column(out_col, pa.array(n.astype(np.int32)))

    return ds.map_batches(Gather, batch_format="pyarrow", concurrency=(1, 2))


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
