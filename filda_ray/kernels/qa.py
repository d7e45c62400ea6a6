"""Algorithm-QA bitfield pack/unpack.

Reference: FILDA.py:2373-2567 assembles a 32-bit QA word per pixel from
~15 boolean tests then bit-reverses it; FILDA_IO.py:1567-1611 is the
inverse.  The engine keeps the pack/unpack inverse-pair contract but
uses straight (non-reversed) LSB-first bit order — the reversal in the
reference is a NetCDF display convention, not semantics.
"""

from __future__ import annotations

import numpy as np

# bit assignments for the detection product (engine-defined)
QA_BITS = {
    "geocoded": 0,         # host found in gazetteer
    "valid_latitude": 1,   # within [-60, 85] (reference FILDA_IO.py:406-408)
    "bg_ring1": 2,         # background stats met min count at ring 1
    "bg_ring2": 3,         # escalated to ring 2 (adaptive window grew)
    "bg_low_n": 4,         # background under-populated even at max ring
    "anom_lo": 5,          # passed low-significance test
    "anom_hi": 6,          # passed high-significance test
    "admin_joined": 7,     # PIP join hit an admin polygon
    "biome_joined": 8,     # PIP join hit a biome polygon
    "dup_in_cell": 9,      # >1 page in the same fine hex cell
    "mega_host": 10,       # host flagged as skew (salted partition)
    "text_extracted": 11,  # html -> text extraction succeeded
}


def qa_pack(flags: dict[str, np.ndarray]) -> np.ndarray:
    """uint32 QA word from named boolean arrays (vectorized bit ops)."""
    n = len(next(iter(flags.values())))
    out = np.zeros(n, dtype=np.uint32)
    for name, arr in flags.items():
        bit = QA_BITS[name]
        out |= (np.asarray(arr).astype(np.uint32) & np.uint32(1)) << np.uint32(bit)
    return out


def qa_unpack(qa: np.ndarray, names: list[str] | None = None) -> dict[str, np.ndarray]:
    """Inverse of ``qa_pack`` (reference inverse pair FILDA_IO.py:1567-1611)."""
    q = np.asarray(qa, dtype=np.uint32)
    names = names or list(QA_BITS)
    return {n: ((q >> np.uint32(QA_BITS[n])) & np.uint32(1)).astype(bool) for n in names}
