"""Contextual background characterization (the engine's cornerstone).

Reference analog: cal_bgstat (FILDA.py:767-872) — per-candidate
adaptive square window grown until enough valid pixels, then median +
MAD of the window.  Scalable re-expression (SURVEY.md §7.6):

1. project rows to (tile, value) — 2 narrow columns, so the 25x
   neighbor re-key below expands tiny rows, not pages;
2. re-key every row to each distinct tile within Chebyshev ring 2 of
   its own tile, tagging the ring distance (vectorized repeat inside
   map_batches — no per-row Python);
3. one groupby(center_tile).map_groups computes median/MAD/count at
   ring<=1 and ring<=2 in the same pass (median/MAD are
   non-combinable, so the group materializes; group size is bounded by
   tile size x 25 and by mega-cell salting upstream).

The adaptive-window semantics (grow until >= min_count valid,
FILDA.py:813-845) become: use ring-1 stats when bg1_n >= min_count,
else ring-2 (recorded in win_ring / QA bits).

One all-to-all shuffle total, keyed by tile id.  The SQL oracle
mirrors this with a neighbor self-join + median()/mad() per tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import cells
from ..kernels.stats import median_mad

MAX_RING = 2


def _rekey_batch(batch: pa.Table, value_col: str, tile_col: str,
                 tile_deg: float) -> pa.Table:
    """(tile, value) rows -> (center_tile, value, ring) expanded rows."""
    tiles = batch.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    nb = cells.pc_neighbors(tiles, MAX_RING, tile_deg)  # (n, 25)
    ncols = int(round(360.0 / tile_deg))
    row = tiles // ncols
    col = tiles % ncols
    nrow = nb.astype(np.int64) // ncols
    ncol_ = nb.astype(np.int64) % ncols
    dcol = np.abs(ncol_ - col[:, None])
    dcol = np.minimum(dcol, ncols - dcol)  # lon wrap distance
    ring = np.maximum(np.abs(nrow - row[:, None]), dcol).astype(np.int8)
    # dedup clamped duplicates per row so each (row, neighbor) is emitted once
    n, w = nb.shape
    keep = np.ones((n, w), dtype=bool)
    for j in range(1, w):
        dup = np.zeros(n, dtype=bool)
        for i in range(j):
            dup |= nb[:, j] == nb[:, i]
        keep[:, j] = ~dup
    flat = keep.ravel()
    return pa.table(
        {
            "center_tile": pa.array(nb.ravel()[flat].astype(np.int32)),
            "value": pa.array(np.repeat(vals, w)[flat]),
            "ring": pa.array(ring.ravel()[flat]),
        }
    )


def _group_stats(g: pd.DataFrame) -> pd.DataFrame:
    v = g["value"].to_numpy()
    r = g["ring"].to_numpy()
    m1, d1 = median_mad(v[r <= 1])
    m2, d2 = median_mad(v)
    return pd.DataFrame(
        {
            "pc_tile": [int(g["center_tile"].iloc[0])],
            "bg1_median": [m1],
            "bg1_mad": [d1],
            "bg1_n": [int((r <= 1).sum())],
            "bg2_median": [m2],
            "bg2_mad": [d2],
            "bg2_n": [len(v)],
        }
    )


def background_stats(ds, value_col: str, tile_col: str = "pc_tile",
                     tile_deg: float = cells.PC_TILE_DEG):
    """Dataset op: rows -> per-tile background stats table.

    Columns out: pc_tile, bg{1,2}_{median,mad,n}.
    """
    narrow = ds.select_columns([tile_col, value_col])
    rekeyed = narrow.map_batches(
        lambda b: _rekey_batch(b, value_col, tile_col, tile_deg),
        batch_format="pyarrow",
    )
    return rekeyed.groupby("center_tile").map_groups(_group_stats, batch_format="pandas")
