"""Distance kernels (vectorized)."""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (vectorized, broadcasting)."""
    p1, l1, p2, l2 = (np.deg2rad(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dphi = p2 - p1
    dlmb = l2 - l1
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def equirect_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Cheap equirectangular approximation (fine for < ~100 km)."""
    p1, l1, p2, l2 = (np.deg2rad(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    x = (l2 - l1) * np.cos((p1 + p2) / 2.0)
    y = p2 - p1
    return EARTH_RADIUS_KM * np.sqrt(x * x + y * y)
