"""Tiling / cell-id kernels: Plate-Carrée tiles and a hex grid.

Reference analogs:
- Plate-Carrée 10-degree tiles, 2400 cells/side
  (FILDA_Time_Cord.py:209-291, :403-427) -> ``pc_tile`` here, with the
  same floor-grid semantics but an engine-chosen tile size.
- MODIS sinusoidal tiles hXXvYY (FILDA_Time_Cord.py:808-922) -> the
  hierarchical hex grid ``hex_cell`` (H3-style) and the S2 quadtree in
  ``s2.py``.
- tile dilation +-1 for bbox cover (FILDA_Time_Cord.py:882-897) ->
  ``pc_neighbors`` / ``hex_ring`` (k-ring expansion).

The hex grid is a FROM-SCRATCH aperture-style hexagonal index (axial
coordinates on an equirectangular projection).  The sandbox has no
``h3`` library; this grid reproduces the *capabilities* H3 provides to
the pipeline — hierarchical uint64 cell ids, k-ring neighbor
enumeration, coarse-prefix partition keys — with H3-res-7-comparable
cell size (edge ~0.01 deg ~ 1.1 km at the equator).  All math is
vectorized numpy and deterministic.

Plate-Carrée tile ids are kept intentionally SQL-expressible (pure
floor arithmetic) so the flagship contextual pipeline has a full
DuckDB oracle; hex/S2 ids are checked by pytest goldens instead.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Plate-Carrée tiles (SQL-mirrorable: floor arithmetic only)
# ---------------------------------------------------------------------------

PC_TILE_DEG = 10.0  # same tile size as the reference's Plate-Carrée layers
PC_NCOLS = int(round(360.0 / PC_TILE_DEG))  # 36
PC_NROWS = int(round(180.0 / PC_TILE_DEG))  # 18


def pc_rowcol(lat: np.ndarray, lon: np.ndarray, tile_deg: float = PC_TILE_DEG):
    """(row, col) of the Plate-Carrée tile containing each point.

    row 0 at lat=-90; col 0 at lon=-180; lon wraps, lat clamps.
    SQL mirror:
      row = least(cast(floor((lat+90)/D) as int), NROWS-1)
      col = ((cast(floor((lon+180)/D) as int) % NCOLS) + NCOLS) % NCOLS
    """
    ncols = int(round(360.0 / tile_deg))
    nrows = int(round(180.0 / tile_deg))
    row = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / tile_deg).astype(np.int64)
    row = np.minimum(row, nrows - 1)
    row = np.maximum(row, 0)
    col = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / tile_deg).astype(np.int64)
    col = ((col % ncols) + ncols) % ncols
    return row.astype(np.int32), col.astype(np.int32)


def pc_tile(lat: np.ndarray, lon: np.ndarray, tile_deg: float = PC_TILE_DEG) -> np.ndarray:
    """int32 tile id = row * ncols + col (SQL: same arithmetic)."""
    ncols = int(round(360.0 / tile_deg))
    row, col = pc_rowcol(lat, lon, tile_deg)
    return (row.astype(np.int64) * ncols + col).astype(np.int32)


def pc_neighbors(tile_id: np.ndarray, ring: int = 1, tile_deg: float = PC_TILE_DEG) -> np.ndarray:
    """All tile ids within ``ring`` rows/cols of each input tile.

    Returns shape (n, (2*ring+1)**2); lon wraps, rows outside [0,nrows)
    are replaced by the center tile id (harmless duplicates — the
    neighborhood union semantics ignore duplicates when re-keying rows
    because each *row* is emitted once per distinct neighbor).
    Reference analog: tile dilation FILDA_Time_Cord.py:882-897.
    """
    ncols = int(round(360.0 / tile_deg))
    nrows = int(round(180.0 / tile_deg))
    t = np.asarray(tile_id, dtype=np.int64)
    row = t // ncols
    col = t % ncols
    offs = [(dr, dc) for dr in range(-ring, ring + 1) for dc in range(-ring, ring + 1)]
    out = np.empty((t.shape[0], len(offs)), dtype=np.int32)
    for k, (dr, dc) in enumerate(offs):
        r = row + dr
        c = (col + dc) % ncols
        valid = (r >= 0) & (r < nrows)
        nid = np.where(valid, r * ncols + c, t)
        out[:, k] = nid.astype(np.int32)
    return out


def rowwise_first_occurrence_mask(mat: np.ndarray) -> np.ndarray:
    """Boolean mask keeping the FIRST occurrence of each value per row
    (row width is small — neighbor/prefix fans of <= ~25 — so the
    O(w^2) column comparison is cheap and fully vectorized over rows).
    Shared by every halo/re-key emitter."""
    n, w = mat.shape
    keep = np.ones((n, w), dtype=bool)
    for j in range(1, w):
        dup = np.zeros(n, dtype=bool)
        for i in range(j):
            dup |= mat[:, j] == mat[:, i]
        keep[:, j] = ~dup
    return keep


def pc_distinct_neighbors_mask(tile_id: np.ndarray, ring: int = 1,
                               tile_deg: float = PC_TILE_DEG):
    """(neighbors, keep_mask): keep_mask deduplicates clamped/self ids
    per row so a flat_map re-key emits each (row, neighbor) pair once."""
    nb = pc_neighbors(tile_id, ring, tile_deg)
    return nb, rowwise_first_occurrence_mask(nb)


# ---------------------------------------------------------------------------
# Hex grid (H3-style axial hexagons, from scratch)
# ---------------------------------------------------------------------------

# Base cell size at resolution 0, in degrees of the equirectangular plane.
HEX_BASE_DEG = 10.0
HEX_APERTURE = 3.0  # linear shrink factor per resolution step
HEX_DEFAULT_RES = 7  # edge ~ 10/3^7*... comparable to H3 res 7 (~1 km)
_HEX_BIAS = np.int64(1) << np.int64(27)  # axial coords packed with bias
_SQRT3 = np.sqrt(3.0)


def _hex_size(res: int) -> float:
    return HEX_BASE_DEG / (HEX_APERTURE ** res)


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-round fractional axial coordinates to the containing hex."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.rint(xf)
    ry = np.rint(yf)
    rz = np.rint(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_qr(lat: np.ndarray, lon: np.ndarray, res: int = HEX_DEFAULT_RES):
    """Axial (q, r) of the pointy-top hex containing each point.

    Plane coords: x = lon, y = lat (degrees, equirectangular).  The
    grid is uniform in the projected plane; area distortion with
    latitude is acceptable for partition/neighbor semantics (documented
    engine choice — the sandbox has no h3 lib).
    """
    size = _hex_size(res)
    x = np.asarray(lon, dtype=np.float64) / size
    y = np.asarray(lat, dtype=np.float64) / size
    # pointy-top axial from plane: q = sqrt3/3 * x - 1/3 * y, r = 2/3 * y
    qf = (_SQRT3 / 3.0) * x - (1.0 / 3.0) * y
    rf = (2.0 / 3.0) * y
    return _axial_round(qf, rf)


def hex_center(q: np.ndarray, r: np.ndarray, res: int = HEX_DEFAULT_RES):
    """(lat, lon) of a hex center (inverse of hex_qr up to rounding)."""
    size = _hex_size(res)
    x = size * _SQRT3 * (np.asarray(q, dtype=np.float64) + np.asarray(r, dtype=np.float64) / 2.0)
    y = size * (3.0 / 2.0) * np.asarray(r, dtype=np.float64)
    return y, x  # lat, lon


def hex_pack(q: np.ndarray, r: np.ndarray, res: int = HEX_DEFAULT_RES) -> np.ndarray:
    """uint64 cell id: [4 bits res | 28 bits q+bias | 28 bits r+bias]."""
    qq = (np.asarray(q, dtype=np.int64) + _HEX_BIAS).astype(np.uint64)
    rr = (np.asarray(r, dtype=np.int64) + _HEX_BIAS).astype(np.uint64)
    return (np.uint64(res) << np.uint64(56)) | (qq << np.uint64(28)) | rr


def hex_unpack(cell: np.ndarray):
    """(res, q, r) from packed uint64 cell ids."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(56)).astype(np.int64)
    q = ((c >> np.uint64(28)) & np.uint64(0x0FFFFFFF)).astype(np.int64) - _HEX_BIAS
    r = (c & np.uint64(0x0FFFFFFF)).astype(np.int64) - _HEX_BIAS
    return res, q, r


def hex_cell(lat: np.ndarray, lon: np.ndarray, res: int = HEX_DEFAULT_RES) -> np.ndarray:
    """uint64 hex cell id for each point (the engine's 'h3_r7' column)."""
    q, r = hex_qr(lat, lon, res)
    return hex_pack(q, r, res)


def hex_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent cell at a coarser resolution (containing the child center).

    Hierarchy-by-center: the coarse hex containing the fine hex's
    center point.  Deterministic; used for partition prefixes
    (north_rule 'partition by H3 prefix').
    """
    res, q, r = hex_unpack(cell)
    child_res = int(res[0]) if len(res) else HEX_DEFAULT_RES
    lat, lon = hex_center(q, r, child_res)
    pq, pr = hex_qr(lat, lon, parent_res)
    return hex_pack(pq, pr, parent_res)


# axial direction vectors for pointy-top hexes
_HEX_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def hex_ring_offsets(k: int) -> np.ndarray:
    """Axial offsets of the ring at exactly distance k (6k cells; k=0 -> [[0,0]])."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    out = []
    q, r = -k, k  # start at direction 4 scaled by k (matches standard ring walk)
    for d in range(6):
        dq, dr = _HEX_DIRS[d]
        for _ in range(k):
            out.append((q, r))
            q += dq
            r += dr
    return np.asarray(out, dtype=np.int64)


def hex_disk_offsets(k: int) -> np.ndarray:
    """All axial offsets within distance k (1 + 3k(k+1) cells)."""
    return np.concatenate([hex_ring_offsets(i) for i in range(k + 1)], axis=0)


def hex_disk(cell: np.ndarray, k: int) -> np.ndarray:
    """grid_disk: shape (n, 1+3k(k+1)) of packed neighbor cell ids."""
    res, q, r = hex_unpack(cell)
    rr = int(res[0]) if len(res) else HEX_DEFAULT_RES
    offs = hex_disk_offsets(k)
    nq = q[:, None] + offs[None, :, 0]
    nr = r[:, None] + offs[None, :, 1]
    return hex_pack(nq, nr, rr)


def hex_distance(cell_a: np.ndarray, cell_b: np.ndarray) -> np.ndarray:
    """Hex grid distance between same-resolution cells."""
    _, qa, ra = hex_unpack(cell_a)
    _, qb, rb = hex_unpack(cell_b)
    dq = qa - qb
    dr = ra - rb
    return ((np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2).astype(np.int64)


def hex_prefix(cell: np.ndarray, shift: int = 5) -> np.ndarray:
    """Coarse uint32 partition key: axial coords right-shifted by ``shift``.

    Groups (2^shift)^2 hexes per prefix — the engine's 'H3 prefix'
    partition key (north_rule).  Cheaper than hex_parent and exactly
    as effective for partitioning.
    """
    _, q, r = hex_unpack(cell)
    qb = ((q >> shift) + (1 << 15)).astype(np.uint32)
    rb = ((r >> shift) + (1 << 15)).astype(np.uint32)
    return ((qb & np.uint32(0xFFFF)) << np.uint32(16)) | (rb & np.uint32(0xFFFF))


def bbox_tiles(lat_min: float, lat_max: float, lon_min: float,
               lon_max: float, *, tile_deg: float = PC_TILE_DEG,
               dilate: int = 0) -> np.ndarray:
    """Sorted unique PC tile ids covering a lat/lon bounding box, with
    optional +-``dilate`` ring dilation — the reference's bbox->tile
    planner (``get_tiles`` FILDA_Time_Cord.py:262-291; sinusoidal
    variant with +-1 dilation and clamp :858-922) as a partition-
    pruning planner: feed the result to ``read_product_partitions`` to
    open ONLY the product partitions a spatial query touches.

    Rows clamp at the poles; columns wrap, and ``lon_min > lon_max``
    means the box crosses the antimeridian (wraps through 180).
    """
    ncols = int(round(360.0 / tile_deg))
    nrows = int(round(180.0 / tile_deg))
    r0, _ = pc_rowcol(np.array([lat_min]), np.array([0.0]), tile_deg)
    r1, _ = pc_rowcol(np.array([lat_max]), np.array([0.0]), tile_deg)
    rlo = max(0, min(int(r0[0]), int(r1[0])) - dilate)
    rhi = min(nrows - 1, max(int(r0[0]), int(r1[0])) + dilate)
    # UNWRAPPED raw column span (endpoint columns alone would collapse
    # a full-width or antimeridian-crossing box), wrapped at the end
    hi = lon_max + 360.0 if lon_min > lon_max else lon_max
    clo_raw = int(np.floor((lon_min + 180.0) / tile_deg)) - dilate
    chi_raw = int(np.floor((hi + 180.0) / tile_deg)) + dilate
    ncount = min(ncols, chi_raw - clo_raw + 1)
    cols = (np.arange(clo_raw, clo_raw + ncount) % ncols + ncols) % ncols
    rows = np.arange(rlo, rhi + 1)
    tiles = (rows[:, None].astype(np.int64) * ncols + cols[None, :]).ravel()
    return np.unique(tiles).astype(np.int32)
