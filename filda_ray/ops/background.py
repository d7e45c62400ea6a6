"""Contextual background characterization (the engine's cornerstone).

Reference analog: cal_bgstat (FILDA.py:767-872) — per-candidate
adaptive square window grown until enough valid pixels, then median +
MAD of the window.  The adaptive-window semantics (grow until >=
min_count valid, FILDA.py:813-845) become: ring-1 (3x3 tile) stats
when populated, else ring-2 (5x5) — recorded in win_ring / QA bits.

Two scalable implementations, identical results:

1. ``background_stats`` (default): per-batch (tile, value) -> COUNT
   HISTOGRAM partials (np.unique — vectorized, mergeable, tiny:
   <= #tiles x #distinct values), halo re-keyed to neighbor center
   tiles and merged by one groupby(center_tile) — fully distributed,
   the driver never holds a histogram.  This is the survey's A4
   'per-cell sums aggregated over neighborhood key' design: the
   all-to-all shuffle of raw rows disappears entirely — only
   O(tiles x distinct-values x window) partial rows move.  Exactness:
   for discrete-valued metrics the histogram median IS the exact
   median (numpy/DuckDB interpolation reproduced on ranks); for
   continuous metrics pass ``quantize`` to bound the value domain.

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

from filda_ray.ops import shuffle_partitions
import pandas as pd
import pyarrow as pa

from ..kernels import cells
from ..kernels.stats import median_mad

MAX_RING = 2
# explicit batch size for histogram-partial stages: partial compression
# (distinct (tile, value) per batch vs rows) must not depend on the
# upstream BLOCK structure — a parquet read that lands as 400 small
# blocks would otherwise emit 5x the partial rows and swamp the merge
# shuffle (measured: 15-20 s vs 1.0 s for the same background).  128k
# balances compression (10x typical parquet mini-blocks) against
# partial-stage parallelism (rows / 128k tasks); rows are 2 narrow
# columns, so a batch is ~2 MB.
HIST_BATCH_ROWS = 128 * 1024


# ---------------------------------------------------------------------------
# histogram path (default)
# ---------------------------------------------------------------------------

def _hist_partial(batch: pa.Table, value_col: str, tile_col: str,
                  quantize: float | None = None) -> pa.Table:
    t = batch.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if quantize is not None:
        # bound the histogram's value domain for continuous metrics:
        # distinct values <= range/quantize, medians become
        # quantize-step approximations (exact path: quantize=None)
        v = np.floor(v / quantize) * quantize
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


def _expand_slices(ss: np.ndarray, ll: np.ndarray, oi: np.ndarray):
    """(slice_start, slice_len, owner) per pair -> flat (owner, index)
    arrays enumerating every histogram row of every owner's window —
    the grouped-arange expansion shared by the PC and hex paths."""
    total = int(ll.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    idx = np.arange(total) - np.repeat(np.cumsum(ll) - ll, ll) + np.repeat(ss, ll)
    return np.repeat(oi, ll), idx


def _merge_sorted_hist(keys: np.ndarray, sv: np.ndarray, sn: np.ndarray):
    """Collapse equal consecutive (key, value) rows of a LEXSORTED
    histogram, summing counts.  Partials arrive unmerged (one row per
    distinct pair PER upstream batch), so without this the per-group
    ring expansion grows with corpus size; after the collapse it is
    bounded by the true histogram domain (tiles x distinct values) —
    scale-INVARIANT.  Found at the 20M-page stress: one block group
    expanded 50M rows / 37 s; merged, the same group is ~25x smaller."""
    if len(keys) == 0:
        return keys, sv, sn
    boundary = np.r_[True, (keys[1:] != keys[:-1]) | (sv[1:] != sv[:-1])]
    starts = np.flatnonzero(boundary)
    return keys[starts], sv[starts], np.add.reduceat(sn, starts)


DEFAULT_RINGS = (1, MAX_RING)
TRIM_FRAC = 0.25  # lowest-25% background mean, FILDA.py:1362-1368


def _stats_for_tiles(ot: np.ndarray, st: np.ndarray, sv: np.ndarray,
                     sn: np.ndarray, rings, trim_frac: float, tile_deg: float):
    """Per-owner-tile ring stats from histogram rows sorted by
    (tile, value): the shared vectorized core of the driver-merge and
    block-halo paths.  ``ot`` = owner tiles (sorted unique)."""
    from ..kernels.stats import grouped_weighted_low_mean, grouped_weighted_median_mad

    uniq_tiles, starts = np.unique(st, return_index=True)
    ends = np.r_[starts[1:], len(st)]
    out = {"pc_tile": ot.astype(np.int32)}
    for k in rings:
        nb, keep = cells.pc_distinct_neighbors_mask(ot.astype(np.int32), k, tile_deg)
        pos = np.searchsorted(uniq_tiles, nb)
        pos_c = np.clip(pos, 0, max(len(uniq_tiles) - 1, 0))
        hit = keep & (len(uniq_tiles) > 0) & (uniq_tiles[pos_c] == nb)
        ss = np.where(hit, starts[pos_c], 0).ravel()
        ll = np.where(hit, ends[pos_c] - starts[pos_c], 0).ravel()
        oi = np.broadcast_to(np.arange(len(ot))[:, None], nb.shape).ravel()
        owner, idx = _expand_slices(ss, ll, oi)
        med, mad, n = grouped_weighted_median_mad(owner, sv[idx], sn[idx], len(ot))
        trim, _ = grouped_weighted_low_mean(owner, sv[idx], sn[idx], len(ot),
                                            frac=trim_frac)
        out[f"bg{k}_median"] = med
        out[f"bg{k}_mad"] = mad
        out[f"bg{k}_n"] = n
        out[f"bg{k}_trim"] = trim
    return out


def background_stats(ds, value_col: str, tile_col: str = "pc_tile",
                     tile_deg: float = cells.PC_TILE_DEG,
                     rings: tuple = DEFAULT_RINGS, trim_frac: float = TRIM_FRAC,
                     quantize: float | None = None, block: int = 6):
    """Dataset op: rows -> per-tile background stats table (histogram
    path; exact for discrete-valued metrics, quantize-step approximate
    for continuous ones when ``quantize`` is set).

    ``rings`` is the adaptive-window ladder (reference grows half-win
    5->31 step 1, FILDA.py:804-845; the engine escalates through a
    configurable ring list instead).  Columns out, per ring k:
    bg{k}_{median,mad,n,trim} — trim is the lowest-``trim_frac`` mean
    of the same window (FRP background analog, FILDA.py:1335-1368).

    Distributed design (the same halo-exchange pattern as
    ``background_stats_hex``): per-batch (tile, value, n) count
    partials are emitted to the ``block`` x ``block`` tile-block of
    every tile in their max-ring neighborhood, then each block group
    computes exact weighted median/MAD/trim for its OWNED populated
    tiles via the shared ``_stats_for_tiles`` kernel.  The driver
    never holds a histogram, and — measured, r3 — the per-block
    parallelism beats a driver merge by ~5-10x even when the histogram
    WOULD fit the driver (the ring expansion is sort-bound: one
    process sorts 20M expanded rows in ~15 s; 18 block groups across
    the pool do it in ~1.5 s).  A group is bounded by (block+2k)^2 x
    distinct values per tile, which ``quantize`` caps for continuous
    metrics.
    """
    max_ring = max(rings)
    assert block > max_ring  # a halo only reaches adjacent blocks
    ncols = int(round(360.0 / tile_deg))
    nbc = -(-ncols // block)
    parts = ds.select_columns([tile_col, value_col]).map_batches(
        lambda b: _hist_partial(b, value_col, tile_col, quantize),
        batch_format="pyarrow", batch_size=HIST_BATCH_ROWS,
    )

    def halo(batch: pa.Table) -> pa.Table:
        t = batch.column("tile").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        nb = cells.pc_neighbors(t, max_ring, tile_deg).astype(np.int64)
        blk = ((nb // ncols) // block) * nbc + (nb % ncols) // block
        own = ((t // ncols) // block) * nbc + (t % ncols) // block
        w = nb.shape[1]
        flat = cells.rowwise_first_occurrence_mask(blk).ravel()
        return pa.table(
            {"tile": pa.array(np.repeat(t, w)[flat].astype(np.int32)),
             "value": pa.array(np.repeat(v, w)[flat]),
             "n": pa.array(np.repeat(n, w)[flat]),
             "blk": pa.array(blk.ravel()[flat].astype(np.int32)),
             "owned": pa.array(np.repeat(own, w)[flat] == blk.ravel()[flat])}
        )

    halo_ds = parts.map_batches(halo, batch_format="pyarrow")
    empty_cols = {"pc_tile": pd.Series(dtype=np.int32)}
    for k in rings:
        empty_cols[f"bg{k}_median"] = pd.Series(dtype=np.float64)
        empty_cols[f"bg{k}_mad"] = pd.Series(dtype=np.float64)
        empty_cols[f"bg{k}_n"] = pd.Series(dtype=np.int64)
        empty_cols[f"bg{k}_trim"] = pd.Series(dtype=np.float64)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        tiles = g["tile"].to_numpy().astype(np.int64)
        vals = g["value"].to_numpy().astype(np.float64)
        cnts = g["n"].to_numpy().astype(np.int64)
        owned = g["owned"].to_numpy().astype(bool)
        ot = np.unique(tiles[owned])
        if ot.size == 0:
            return pd.DataFrame(empty_cols)
        order = np.lexsort((vals, tiles))
        st, sv, sn = _merge_sorted_hist(tiles[order], vals[order], cnts[order])
        return pd.DataFrame(_stats_for_tiles(ot, st, sv, sn, rings, trim_frac,
                                             tile_deg))

    return halo_ds.groupby("blk", num_partitions=shuffle_partitions()).map_groups(per_block, batch_format="pandas")


# ---------------------------------------------------------------------------
# hex-grid variant: background over k-ring neighborhoods of the fine
# hex cells (the north_star's per-pixel contextual kernel on the
# H3-style grid; ring-k1 escalating to ring-k2)
# ---------------------------------------------------------------------------

def _hex_hist_partial(batch: pa.Table, value_col: str, cell_col: str,
                      quantize: float | None = None) -> pa.Table:
    c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if quantize is not None:
        v = np.floor(v / quantize) * quantize
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


def _hex_stats_for_owned(oc: np.ndarray, sc: np.ndarray, sv: np.ndarray,
                         sn: np.ndarray, k: int):
    """(median, mad, n) over the disk(k) neighborhood of each owned
    cell, from (cell, value, n) histogram rows sorted by (cell, value).

    Fully vectorized: per (owned, neighbor) pair the histogram slice of
    the neighbor cell is located by searchsorted, the slices are
    expanded into (owner_idx, value, count) triplets with one
    grouped-arange, and ``grouped_weighted_median_mad`` resolves every
    owner in one pass.
    """
    from ..kernels.stats import grouped_weighted_median_mad

    uc, ustart = np.unique(sc, return_index=True)
    uend = np.r_[ustart[1:], len(sc)]
    disk = cells.hex_disk(oc, k)                       # (m, w)
    pos = np.searchsorted(uc, disk)
    pos_c = np.clip(pos, 0, max(len(uc) - 1, 0))
    hit = (len(uc) > 0) & (uc[pos_c] == disk)
    ss = np.where(hit, ustart[pos_c], 0).ravel()
    ll = np.where(hit, uend[pos_c] - ustart[pos_c], 0).ravel()
    oi = np.broadcast_to(np.arange(len(oc))[:, None], disk.shape).ravel()
    total = int(ll.sum())
    if total == 0:
        return (np.full(len(oc), np.nan), np.full(len(oc), np.nan),
                np.zeros(len(oc), dtype=np.int64))
    idx = np.arange(total) - np.repeat(np.cumsum(ll) - ll, ll) + np.repeat(ss, ll)
    owner = np.repeat(oi, ll)
    return grouped_weighted_median_mad(owner, sv[idx], sn[idx], len(oc))


_HEX_BG_SCHEMA = pa.schema(
    [("cell", pa.uint64()),
     ("bg1_median", pa.float64()), ("bg1_mad", pa.float64()), ("bg1_n", pa.int64()),
     ("bg2_median", pa.float64()), ("bg2_mad", pa.float64()), ("bg2_n", pa.int64())]
)


def background_stats_hex(ds, value_col: str, cell_col: str = "hex_r7",
                         k1: int = 1, k2: int = 2, *, prefix_shift: int = 5,
                         quantize: float | None = None):
    """Per-hex-cell background median/MAD over ring-k1 and ring-k2
    neighborhoods (adaptive-window analog on the fine hex grid).

    Distributed design (no driver materialization): (cell, value, n)
    count partials are HALO-emitted to the coarse hex prefix of every
    cell in their disk(k2) — a boundary cell is visible to adjacent
    prefix blocks, duplication ~ block perimeter/area — then each
    prefix group computes exact weighted median/MAD for its OWNED
    cells only, fully vectorized (no per-cell Python).  The same
    halo-exchange pattern as ``hotspot.knn_hotspots``.

    Partitioning assumption: k2 < 2^prefix_shift (a k2-disk spans at
    most adjacent prefix blocks).  Output: cell, bg{1,2}_{median,mad,n}.
    """
    assert k2 < (1 << prefix_shift)

    parts = ds.select_columns([cell_col, value_col]).map_batches(
        lambda b: _hex_hist_partial(b, value_col, cell_col, quantize),
        batch_format="pyarrow", batch_size=HIST_BATCH_ROWS,
    )

    def halo_emit(batch: pa.Table) -> pa.Table:
        c = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        disk = cells.hex_disk(c, k2)
        pfx = cells.hex_prefix(disk.ravel(), prefix_shift).reshape(disk.shape)
        own = cells.hex_prefix(c, prefix_shift)
        m = disk.shape[1]
        flat = cells.rowwise_first_occurrence_mask(pfx).ravel()
        return pa.table(
            {"cell": pa.array(np.repeat(c, m)[flat], pa.uint64()),
             "value": pa.array(np.repeat(v, m)[flat]),
             "n": pa.array(np.repeat(n, m)[flat]),
             "pfx": pa.array(pfx.ravel()[flat], pa.uint32()),
             "owned": pa.array(np.repeat(own, m)[flat] == pfx.ravel()[flat])}
        )

    halo = parts.map_batches(halo_emit, batch_format="pyarrow")

    def per_prefix(g: pd.DataFrame) -> pd.DataFrame:
        cellv = g["cell"].to_numpy().astype(np.uint64)
        vals = g["value"].to_numpy().astype(np.float64)
        cnts = g["n"].to_numpy().astype(np.int64)
        owned = g["owned"].to_numpy().astype(bool)
        oc = np.unique(cellv[owned])
        if len(oc) == 0:
            return pd.DataFrame({f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                                 for f in _HEX_BG_SCHEMA})
        order = np.lexsort((vals, cellv))
        sc, sv, sn = _merge_sorted_hist(cellv[order], vals[order], cnts[order])
        out = {"cell": oc}
        for tag, k in (("bg1", k1), ("bg2", k2)):
            med, mad, n = _hex_stats_for_owned(oc, sc, sv, sn, k)
            out[f"{tag}_median"], out[f"{tag}_mad"], out[f"{tag}_n"] = med, mad, n
        return pd.DataFrame(out)

    return halo.groupby("pfx", num_partitions=shuffle_partitions()).map_groups(per_prefix, batch_format="pandas")


# ---------------------------------------------------------------------------
# shuffle path (general floats; the original re-key + groupby design)
# ---------------------------------------------------------------------------

def _rekey_batch(batch: pa.Table, value_col: str, tile_col: str,
                 tile_deg: float, max_ring: int = MAX_RING) -> pa.Table:
    """(tile, value) rows -> (center_tile, value, ring) expanded rows."""
    tiles = batch.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    nb = cells.pc_neighbors(tiles, max_ring, tile_deg)  # (n, (2k+1)^2)
    ncols = int(round(360.0 / tile_deg))
    row = tiles // ncols
    col = tiles % ncols
    nrow = nb.astype(np.int64) // ncols
    ncol_ = nb.astype(np.int64) % ncols
    dcol = np.abs(ncol_ - col[:, None])
    dcol = np.minimum(dcol, ncols - dcol)  # lon wrap distance
    ring = np.maximum(np.abs(nrow - row[:, None]), dcol).astype(np.int8)
    n, w = nb.shape
    flat = cells.rowwise_first_occurrence_mask(nb).ravel()
    return pa.table(
        {
            "center_tile": pa.array(nb.ravel()[flat].astype(np.int32)),
            "value": pa.array(np.repeat(vals, w)[flat]),
            "ring": pa.array(ring.ravel()[flat]),
        }
    )


def background_stats_shuffle(ds, value_col: str, tile_col: str = "pc_tile",
                             tile_deg: float = cells.PC_TILE_DEG,
                             rings: tuple = DEFAULT_RINGS, trim_frac: float = TRIM_FRAC):
    """General-float path: one groupby shuffle of narrow re-keyed rows."""
    from ..kernels.stats import trimmed_low_mean

    narrow = ds.select_columns([tile_col, value_col])
    max_ring = max(rings)
    rekeyed = narrow.map_batches(
        lambda b: _rekey_batch(b, value_col, tile_col, tile_deg, max_ring),
        batch_format="pyarrow",
    )

    def group_stats(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        r = g["ring"].to_numpy()
        out = {"pc_tile": [int(g["center_tile"].iloc[0])]}
        for k in rings:
            sel = v[r <= k]
            m, d = median_mad(sel)
            t, _ = trimmed_low_mean(sel, trim_frac)
            out[f"bg{k}_median"] = [m]
            out[f"bg{k}_mad"] = [d]
            out[f"bg{k}_n"] = [int(sel.size)]
            out[f"bg{k}_trim"] = [t]
        return pd.DataFrame(out)

    return rekeyed.groupby("center_tile", num_partitions=shuffle_partitions()).map_groups(group_stats, batch_format="pandas")
