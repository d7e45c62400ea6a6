"""Polygon side layers + point-in-polygon kernels (from scratch).

Reference analog: static raster/tile layers joined per pixel — land
type (FILDA.py:1570-1699), peatland (FILDA.py:2034-2144).  In the
engine these are polygon layers joined by PIP in actor pools
(SURVEY.md T2 mapping).  No shapely in the sandbox, so both the
geometry and the spatial index are implemented here:

- ``admin_polygons``: a 5x6 grid of boxes over the gazetteer extent.
  Membership has a closed-form floor() mirror (``admin_id_analytic``)
  -> the PIP *code path* is oracle-checked in SQL.
- ``biome_polygons``: irregular convex polygons around deterministic
  seeds (first-match semantics, -1 when outside all) -> checked in
  pytest against an independent winding-number implementation.
- ``point_in_polygon``: vectorized crossing-number ray cast with the
  half-open edge rule (a point on the bottom/left boundary is inside),
  matching floor() semantics on the grid layer.
- ``GridIndex``: bbox bucket index over a regular grid (STRtree
  stand-in): candidate polygons per point in O(1).
"""

from __future__ import annotations

import numpy as np

from .pages import LAT_MIN, LAT_SPAN, LON_MIN, LON_SPAN

ADMIN_ROWS, ADMIN_COLS = 5, 6
ADMIN_DLAT = LAT_SPAN / ADMIN_ROWS   # 29 deg
ADMIN_DLON = LON_SPAN / ADMIN_COLS   # 60 deg


def admin_id_analytic(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Closed-form admin box id (the SQL oracle's formula)."""
    r = np.floor((np.asarray(lat, dtype=np.float64) - LAT_MIN) / ADMIN_DLAT).astype(np.int64)
    c = np.floor((np.asarray(lon, dtype=np.float64) - LON_MIN) / ADMIN_DLON).astype(np.int64)
    r = np.clip(r, 0, ADMIN_ROWS - 1)
    c = np.clip(c, 0, ADMIN_COLS - 1)
    return (r * ADMIN_COLS + c).astype(np.int32)


def sql_admin_id(lat: str, lon: str) -> str:
    return (
        f"cast(least(greatest(cast(floor(({lat} - {LAT_MIN!r}) / {ADMIN_DLAT!r}) as bigint), 0), {ADMIN_ROWS - 1})"
        f" * {ADMIN_COLS} + "
        f"least(greatest(cast(floor(({lon} - {LON_MIN!r}) / {ADMIN_DLON!r}) as bigint), 0), {ADMIN_COLS - 1}) as int)"
    )


def admin_polygons():
    """list of (poly_id, name, vertices[N,2] as (lon, lat) closed CCW ring)."""
    polys = []
    for r in range(ADMIN_ROWS):
        for c in range(ADMIN_COLS):
            y0 = LAT_MIN + r * ADMIN_DLAT
            y1 = y0 + ADMIN_DLAT
            x0 = LON_MIN + c * ADMIN_DLON
            x1 = x0 + ADMIN_DLON
            verts = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
            polys.append((r * ADMIN_COLS + c, f"A{r * ADMIN_COLS + c:02d}", verts))
    return polys


def biome_polygons(n: int = 40, seed: int = 11):
    """Deterministic irregular convex polygons (may overlap / leave
    gaps; first-match by poly_id, -1 outside)."""
    rng = np.random.RandomState(seed)
    polys = []
    for pid in range(n):
        cy = LAT_MIN + LAT_SPAN * rng.rand()
        cx = LON_MIN + LON_SPAN * rng.rand()
        k = rng.randint(5, 10)
        ang = np.sort(rng.rand(k) * 2 * np.pi)
        rad = 4.0 + 16.0 * rng.rand(k)
        verts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        polys.append((pid, f"B{pid:02d}", verts))
    return polys


def point_in_polygon(px: np.ndarray, py: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number ray cast (points x one polygon).

    Half-open rule: an edge contributes when y0 <= py < y1 (ray to
    +x), so points on the bottom boundary are inside and on the top
    are outside — consistent with floor() bucketing on the grid layer.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = verts.shape[0]
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        cond = (y0 <= py) != (y1 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        inside ^= cond & (px < xint)
    return inside


def winding_number_inside(px: float, py: float, verts: np.ndarray) -> bool:
    """Independent scalar oracle (winding number) for tests."""
    wn = 0
    n = verts.shape[0]
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        if y0 <= py:
            if y1 > py and (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) > 0:
                wn += 1
        else:
            if y1 <= py and (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) < 0:
                wn -= 1
    return wn != 0


class GridIndex:
    """Regular-grid bbox bucket index over polygons (STRtree stand-in).

    Build: O(total bbox-covered buckets).  Query: per-point bucket ->
    candidate polygon ids -> exact PIP only on candidates.  At 100 TB
    the polygon layer (~10^4-10^6 polys) is built once per actor in
    __init__ — never per batch.
    """

    def __init__(self, polys, cell_deg: float = 5.0):
        self.polys = polys
        self.cell_deg = cell_deg
        self.ncols = int(np.ceil(360.0 / cell_deg))
        self.buckets: dict[int, list[int]] = {}
        for k, (_, _, verts) in enumerate(polys):
            x0, y0 = verts.min(axis=0)
            x1, y1 = verts.max(axis=0)
            c0 = int(np.floor((x0 + 180.0) / cell_deg))
            c1 = int(np.floor((x1 + 180.0) / cell_deg))
            r0 = int(np.floor((y0 + 90.0) / cell_deg))
            r1 = int(np.floor((y1 + 90.0) / cell_deg))
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    self.buckets.setdefault(r * self.ncols + c, []).append(k)

    def query(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """First-match polygon id per point (-1 when none).

        Groups points by candidate set so PIP runs vectorized per
        (bucket, polygon) — no per-point Python loop over polygons.
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.full(lon.shape, -1, dtype=np.int32)
        bkt = (
            np.floor((lat + 90.0) / self.cell_deg).astype(np.int64) * self.ncols
            + np.floor((lon + 180.0) / self.cell_deg).astype(np.int64)
        )
        for b in np.unique(bkt):
            cand = self.buckets.get(int(b))
            if not cand:
                continue
            m = bkt == b
            undecided = np.where(m)[0]
            for k in cand:  # ordered -> first-match semantics
                if undecided.size == 0:
                    break
                pid, _, verts = self.polys[k]
                hit = point_in_polygon(lon[undecided], lat[undecided], verts)
                out[undecided[hit]] = pid
                undecided = undecided[~hit]
        return out
