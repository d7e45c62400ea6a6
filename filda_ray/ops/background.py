"""Contextual background characterization (the engine's cornerstone).

Reference analog: cal_bgstat (FILDA.py:767-872) — per-candidate
adaptive square window grown until enough valid pixels, then median +
MAD of the window.  The adaptive-window semantics (grow until >=
min_count valid, FILDA.py:813-845) become: ring-1 (3x3 tile) stats
when populated, else ring-2 (5x5) — recorded in win_ring / QA bits.

Two scalable implementations, identical results:

1. ``background_stats`` (default, integer-valued metrics): per-batch
   (tile, value) -> COUNT HISTOGRAM partials (np.unique — vectorized,
   mergeable, tiny: <= #tiles x #distinct values), merged once, then
   exact weighted median/MAD per tile from merged counts, including
   the ring-1/ring-2 neighborhoods, computed in milliseconds.  This is
   the survey's A4 'per-cell sums aggregated over neighborhood key'
   design: the all-to-all shuffle of raw rows disappears entirely —
   only O(tiles x distinct-values) partial rows move.  Exactness: for
   discrete-valued metrics the histogram median IS the exact median
   (numpy/DuckDB interpolation reproduced on ranks).

2. ``background_stats_shuffle`` (general floats): re-key each row to
   its <=25 neighbor tiles and groupby(tile).map_groups median/MAD —
   one sort shuffle of narrow (tile, value, ring) rows.  Kept for
   continuous metrics where histograms would be approximate.

At 10^12 rows both medians are over per-tile multisets; the histogram
path stays exact and cheap as long as the value domain is discrete
(token counts, byte lengths, quantized scores) — which is exactly the
flagship's metric family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import cells
from ..kernels.stats import median_mad

MAX_RING = 2


# ---------------------------------------------------------------------------
# histogram path (default)
# ---------------------------------------------------------------------------

def _hist_partial(batch: pa.Table, value_col: str, tile_col: str) -> pa.Table:
    t = batch.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~np.isnan(v) & (t >= 0)
    tv, vv = t[ok], v[ok]
    vi = vv.astype(np.int64)
    if vv.size and (vi == vv).all() and vi.min() >= 0 and vi.max() < (1 << 31):
        # integer fast path: composite 1-D key (tile << 32 | value)
        key = (tv << np.int64(32)) | vi
        uk, counts = np.unique(key, return_counts=True)
        ut = (uk >> np.int64(32)).astype(np.int32)
        uv = (uk & np.int64(0xFFFFFFFF)).astype(np.float64)
    else:
        pairs = np.stack([tv, vv], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        ut = uniq[:, 0].astype(np.int32)
        uv = uniq[:, 1]
    return pa.table(
        {
            "tile": pa.array(ut),
            "value": pa.array(uv),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def _merge_partials(batch: pa.Table) -> pa.Table:
    """Sum counts of identical (tile, value) pairs across partials."""
    t = batch.column("tile").to_numpy().astype(np.int64)
    v = batch.column("value").to_numpy()
    n = batch.column("n").to_numpy()
    vi = v.astype(np.int64)
    if v.size and (vi == v).all() and vi.min() >= 0 and vi.max() < (1 << 31):
        key = (t << np.int64(32)) | vi
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "tile": pa.array((uk >> np.int64(32)).astype(np.int32)),
                "value": pa.array((uk & np.int64(0xFFFFFFFF)).astype(np.float64)),
                "n": pa.array(sums),
            }
        )
    import pandas as pd

    df = pd.DataFrame({"tile": t.astype(np.int32), "value": v, "n": n})
    agg = df.groupby(["tile", "value"], sort=True)["n"].sum().reset_index()
    return pa.Table.from_pandas(agg, preserve_index=False)


def _weighted_median(values: np.ndarray, counts: np.ndarray) -> float:
    """Exact median of the multiset {values repeated counts times},
    matching numpy/DuckDB linear interpolation (avg of the two middle
    elements for even totals).  ``values`` must be sorted ascending."""
    total = counts.sum()
    if total == 0:
        return np.nan
    cum = np.cumsum(counts)
    if total % 2 == 1:
        r = total // 2  # 0-based middle rank
        return float(values[np.searchsorted(cum, r + 1)])
    r1, r2 = total // 2 - 1, total // 2
    v1 = values[np.searchsorted(cum, r1 + 1)]
    v2 = values[np.searchsorted(cum, r2 + 1)]
    return float((v1 + v2) / 2.0)


def _median_mad_hist(values: np.ndarray, counts: np.ndarray):
    med = _weighted_median(values, counts)
    if np.isnan(med):
        return np.nan, np.nan
    dev = np.abs(values - med)
    order = np.argsort(dev, kind="mergesort")
    return med, _weighted_median(dev[order], counts[order])


def background_stats(ds, value_col: str, tile_col: str = "pc_tile",
                     tile_deg: float = cells.PC_TILE_DEG):
    """Dataset op: rows -> per-tile background stats table (histogram
    path; exact for discrete-valued metrics).

    Columns out: pc_tile, bg{1,2}_{median,mad,n}.
    """
    import ray.data as rd

    parts = ds.select_columns([tile_col, value_col]).map_batches(
        lambda b: _hist_partial(b, value_col, tile_col), batch_format="pyarrow"
    )
    # tree reduce: coalesce partials and re-merge in parallel so the
    # driver only ever sees <= 8 merged histograms (each bounded by
    # #tiles x #distinct values), not one partial per input block
    parts = parts.repartition(8).map_batches(_merge_partials, batch_format="pyarrow")
    df = parts.to_pandas()
    if df.empty:
        df = pd.DataFrame({"tile": pd.Series(dtype=np.int32),
                           "value": pd.Series(dtype=np.float64),
                           "n": pd.Series(dtype=np.int64)})
    merged = df.groupby(["tile", "value"], sort=True)["n"].sum().reset_index()

    tiles = merged["tile"].to_numpy()
    vals = merged["value"].to_numpy()
    cnts = merged["n"].to_numpy()
    uniq_tiles = np.unique(tiles)
    # per-tile slices (merged is sorted by tile, value)
    starts = np.searchsorted(tiles, uniq_tiles, side="left")
    ends = np.searchsorted(tiles, uniq_tiles, side="right")
    hist = {int(t): (vals[s:e], cnts[s:e]) for t, s, e in zip(uniq_tiles, starts, ends)}

    nb1, keep1 = cells.pc_distinct_neighbors_mask(uniq_tiles.astype(np.int32), 1, tile_deg)
    nb2, keep2 = cells.pc_distinct_neighbors_mask(uniq_tiles.astype(np.int32), MAX_RING, tile_deg)

    rows = {"pc_tile": [], "bg1_median": [], "bg1_mad": [], "bg1_n": [],
            "bg2_median": [], "bg2_mad": [], "bg2_n": []}
    for i, t in enumerate(uniq_tiles):
        out = [int(t)]
        for nb, keep in ((nb1, keep1), (nb2, keep2)):
            vs, cs = [], []
            for nt in nb[i][keep[i]]:
                h = hist.get(int(nt))
                if h is not None:
                    vs.append(h[0])
                    cs.append(h[1])
            if vs:
                v = np.concatenate(vs)
                c = np.concatenate(cs)
                order = np.argsort(v, kind="mergesort")
                v, c = v[order], c[order]
                med, mad = _median_mad_hist(v, c)
                out += [med, mad, int(c.sum())]
            else:
                out += [np.nan, np.nan, 0]
        for k, val in zip(rows, out):
            rows[k].append(val)
    bg = pa.table(
        {
            "pc_tile": pa.array(np.asarray(rows["pc_tile"], dtype=np.int32)),
            "bg1_median": pa.array(np.asarray(rows["bg1_median"], dtype=np.float64)),
            "bg1_mad": pa.array(np.asarray(rows["bg1_mad"], dtype=np.float64)),
            "bg1_n": pa.array(np.asarray(rows["bg1_n"], dtype=np.int64)),
            "bg2_median": pa.array(np.asarray(rows["bg2_median"], dtype=np.float64)),
            "bg2_mad": pa.array(np.asarray(rows["bg2_mad"], dtype=np.float64)),
            "bg2_n": pa.array(np.asarray(rows["bg2_n"], dtype=np.int64)),
        }
    )
    return rd.from_arrow(bg)


# ---------------------------------------------------------------------------
# hex-grid variant: background over k-ring neighborhoods of the fine
# hex cells (the north_star's per-pixel contextual kernel on the
# H3-style grid; ring-k1 escalating to ring-k2)
# ---------------------------------------------------------------------------

def _hex_hist_partial(batch: pa.Table, value_col: str, cell_col: str) -> pa.Table:
    c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~np.isnan(v)
    key_c, key_v = c[ok], v[ok]
    order = np.lexsort((key_v, key_c))
    kc, kv = key_c[order], key_v[order]
    boundary = np.r_[True, (kc[1:] != kc[:-1]) | (kv[1:] != kv[:-1])]
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.r_[starts, len(kc)])
    return pa.table(
        {"cell": pa.array(kc[starts], pa.uint64()),
         "value": pa.array(kv[starts]),
         "n": pa.array(counts.astype(np.int64))}
    )


def background_stats_hex(ds, value_col: str, cell_col: str = "hex_r7",
                         k1: int = 1, k2: int = 2):
    """Per-hex-cell background median/MAD over ring-k1 and ring-k2
    neighborhoods (adaptive-window analog on the fine hex grid).

    Same mergeable-histogram design as the PC path: (cell, value)
    count partials -> merge -> per occupied cell, concatenate the
    histograms of its hex_disk(k) neighbors and take exact weighted
    median/MAD.  Output: cell, bg{1,2}_{median,mad,n}.
    """
    import ray.data as rd

    parts = ds.select_columns([cell_col, value_col]).map_batches(
        lambda b: _hex_hist_partial(b, value_col, cell_col), batch_format="pyarrow"
    )
    df = parts.to_pandas()
    if df.empty:
        return rd.from_arrow(pa.table(
            {"cell": pa.array([], pa.uint64()),
             "bg1_median": pa.array([], pa.float64()), "bg1_mad": pa.array([], pa.float64()),
             "bg1_n": pa.array([], pa.int64()),
             "bg2_median": pa.array([], pa.float64()), "bg2_mad": pa.array([], pa.float64()),
             "bg2_n": pa.array([], pa.int64())}))
    merged = df.groupby(["cell", "value"], sort=True)["n"].sum().reset_index()
    cellv = merged["cell"].to_numpy().astype(np.uint64)
    vals = merged["value"].to_numpy()
    cnts = merged["n"].to_numpy()
    uniq = np.unique(cellv)
    starts = np.searchsorted(cellv, uniq, side="left")
    ends = np.searchsorted(cellv, uniq, side="right")
    hist = {int(c): (vals[s:e], cnts[s:e]) for c, s, e in zip(uniq, starts, ends)}

    disks = {k: cells.hex_disk(uniq, k) for k in (k1, k2)}
    out = {"cell": [], "bg1_median": [], "bg1_mad": [], "bg1_n": [],
           "bg2_median": [], "bg2_mad": [], "bg2_n": []}
    for i, c in enumerate(uniq):
        out["cell"].append(int(c))
        for tag, k in (("bg1", k1), ("bg2", k2)):
            vs, cs = [], []
            for nb in disks[k][i]:
                h = hist.get(int(nb))
                if h is not None:
                    vs.append(h[0])
                    cs.append(h[1])
            if vs:
                v = np.concatenate(vs)
                n = np.concatenate(cs)
                order = np.argsort(v, kind="mergesort")
                med, mad = _median_mad_hist(v[order], n[order])
                out[f"{tag}_median"].append(med)
                out[f"{tag}_mad"].append(mad)
                out[f"{tag}_n"].append(int(n.sum()))
            else:
                out[f"{tag}_median"].append(np.nan)
                out[f"{tag}_mad"].append(np.nan)
                out[f"{tag}_n"].append(0)
    return rd.from_arrow(pa.table(
        {"cell": pa.array(np.asarray(out["cell"], dtype=np.uint64)),
         "bg1_median": pa.array(out["bg1_median"], pa.float64()),
         "bg1_mad": pa.array(out["bg1_mad"], pa.float64()),
         "bg1_n": pa.array(out["bg1_n"], pa.int64()),
         "bg2_median": pa.array(out["bg2_median"], pa.float64()),
         "bg2_mad": pa.array(out["bg2_mad"], pa.float64()),
         "bg2_n": pa.array(out["bg2_n"], pa.int64())}))


# ---------------------------------------------------------------------------
# shuffle path (general floats; the original re-key + groupby design)
# ---------------------------------------------------------------------------

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


def background_stats_shuffle(ds, value_col: str, tile_col: str = "pc_tile",
                             tile_deg: float = cells.PC_TILE_DEG):
    """General-float path: one groupby shuffle of narrow re-keyed rows."""
    narrow = ds.select_columns([tile_col, value_col])
    rekeyed = narrow.map_batches(
        lambda b: _rekey_batch(b, value_col, tile_col, tile_deg),
        batch_format="pyarrow",
    )
    return rekeyed.groupby("center_tile").map_groups(_group_stats, batch_format="pandas")
