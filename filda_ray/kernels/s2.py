"""S2 cell ids (pure-numpy, vectorized) — from-scratch implementation
of the public S2 geometry cell-id scheme (s2geometry.io; Google's
open-source S2 library algorithm description).

Pipeline use: the engine's second hierarchical spatial index
(BASELINE.json north_star: 'S2 level-12 cell ids ... in batched Arrow
kernels').  Reference analog: the MODIS sinusoidal tile ids of
FILDA_Time_Cord.py:808-922 (hierarchical, equal-area-ish spatial keys).

Scheme recap (all public):
- lat/lon -> unit XYZ -> cube face (0..5) + (u, v) face coords,
- quadratic u->s projection: s = sqrt(1+3u)/2 for u>=0 else
  1 - sqrt(1-3u)/2  (the library's S2_QUADRATIC_PROJECTION),
- (s, t) -> discrete (i, j) leaf coords at level 30,
- Hilbert curve over (i, j) per face -> 60-bit position,
- 64-bit id: [3 bits face][2*level bits pos][1][trailing zeros].

The sandbox has no s2sphere/s2geometry to diff against; tests assert
structural invariants (id format, face recovery, encode/decode round
trip, Hilbert adjacency continuity, level arithmetic).
"""

from __future__ import annotations

import numpy as np

# Hilbert traversal tables from the public S2 library.
SWAP_MASK = 1
INVERT_MASK = 2
# kIJtoPos[orientation][2*i + j] -> child position on the Hilbert curve
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.uint64,
)
# kPosToIJ[orientation][pos] -> 2*i + j
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.uint64,
)
# kPosToOrientation[pos] -> orientation XOR delta
_POS_TO_ORIENT = np.array([SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.uint64)

MAX_LEVEL = 30
DEFAULT_LEVEL = 12


def latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray):
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube face (0..5) and face coordinates (u, v) per the S2 layout:
    face 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # (u, v) by face (S2's ValidFaceXYZtoUV)
    u = np.empty_like(x)
    v = np.empty_like(x)
    m = face == 0
    u[m] = y[m] / x[m]
    v[m] = z[m] / x[m]
    m = face == 1
    u[m] = -x[m] / y[m]
    v[m] = z[m] / y[m]
    m = face == 2
    u[m] = -x[m] / z[m]
    v[m] = -y[m] / z[m]
    m = face == 3
    u[m] = z[m] / x[m]
    v[m] = y[m] / x[m]
    m = face == 4
    u[m] = z[m] / y[m]
    v[m] = -x[m] / y[m]
    m = face == 5
    u[m] = -y[m] / z[m]
    v[m] = -x[m] / z[m]
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (S2_QUADRATIC_PROJECTION)."""
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    ij = np.floor(np.asarray(s, dtype=np.float64) * n).astype(np.int64)
    return np.clip(ij, 0, n - 1)


def _hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position (2*level bits) of (i, j) on a face.

    Iterative per-level walk using the public traversal tables;
    vectorized: ``level`` iterations of O(n) numpy ops.
    """
    orient = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    pos = np.zeros(face.shape, dtype=np.uint64)
    i = i.astype(np.uint64)
    j = j.astype(np.uint64)
    for k in range(level - 1, -1, -1):
        bi = (i >> np.uint64(k)) & np.uint64(1)
        bj = (j >> np.uint64(k)) & np.uint64(1)
        ij = bi * np.uint64(2) + bj
        d = _IJ_TO_POS[orient.astype(np.int64), ij.astype(np.int64)]
        pos = (pos << np.uint64(2)) | d
        orient = orient ^ _POS_TO_ORIENT[d.astype(np.int64)]
    return pos


def _hilbert_ij(face: np.ndarray, pos: np.ndarray, level: int):
    """Inverse of ``_hilbert_pos``: position -> (i, j)."""
    orient = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    i = np.zeros(face.shape, dtype=np.uint64)
    j = np.zeros(face.shape, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        d = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ[orient.astype(np.int64), d.astype(np.int64)]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient = orient ^ _POS_TO_ORIENT[d.astype(np.int64)]
    return i.astype(np.int64), j.astype(np.int64)


def s2_cell(lat_deg: np.ndarray, lon_deg: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """uint64 S2 cell id at ``level`` for each (lat, lon)."""
    x, y, z = latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    pos = _hilbert_pos(face, i, j, level)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (face.astype(np.uint64) << np.uint64(61)) | (pos << shift) | lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level from the trailing-one bit position."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    # lsb = 1 << (2*(30-level)) -> level = 30 - log2(lsb)/2
    log2 = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for b in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(b))
        log2 += np.where(m, b, 0)
        v = np.where(m, v >> np.uint64(b), v)
    return MAX_LEVEL - log2 // 2


def s2_face(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(61)).astype(np.int64)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at a coarser level (id prefix arithmetic)."""
    c = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (c & ~((new_lsb << np.uint64(1)) - np.uint64(1))) | new_lsb


def s2_cell_center(cell: np.ndarray, level: int):
    """(lat, lon) of the cell center (inverse transform, for tests)."""
    c = np.asarray(cell, dtype=np.uint64)
    face = s2_face(c)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    pos = (c >> shift) & ((np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))
    i, j = _hilbert_ij(face, pos, level)
    n = float(1 << level)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u = st_to_uv(s)
    v = st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    # face -> xyz (S2's FaceUVtoXYZ)
    defs = {
        0: lambda u, v: (np.ones_like(u), u, v),
        1: lambda u, v: (-u, np.ones_like(u), v),
        2: lambda u, v: (-u, -v, np.ones_like(u)),
        3: lambda u, v: (-np.ones_like(u), -v, -u),
        4: lambda u, v: (v, -np.ones_like(u), -u),
        5: lambda u, v: (v, u, -np.ones_like(u)),
    }
    for f, fn in defs.items():
        m = face == f
        if np.any(m):
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.rad2deg(np.arcsin(z / norm))
    lon = np.rad2deg(np.arctan2(y, x))
    return lat, lon
