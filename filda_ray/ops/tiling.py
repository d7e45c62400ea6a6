"""Cell/tile encoding stage.

Reference analog: tile-id computation M26 (FILDA_Time_Cord.py:209-291,
:808-922) — here one vectorized map_batches adds all spatial keys in a
single pass over zero-copy Arrow batches:

- pc_tile : int32 Plate-Carrée tile (SQL-oracle-checkable)
- hex_r7  : uint64 hex cell (H3-style, partition-grade)
- s2_l12  : uint64 S2 quadtree cell
- hex_prefix : uint32 coarse partition key (north_rule 'H3 prefix')

No shuffle; cost is pure per-batch numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import cells, s2


def encode_batch(batch: pa.Table, *, hex_res: int = cells.HEX_DEFAULT_RES,
                 s2_level: int = s2.DEFAULT_LEVEL,
                 tile_deg: float = cells.PC_TILE_DEG) -> pa.Table:
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    ok = ~(np.isnan(lat) | np.isnan(lon))
    lat0 = np.where(ok, lat, 0.0)
    lon0 = np.where(ok, lon, 0.0)
    pc = cells.pc_tile(lat0, lon0, tile_deg)
    hexc = cells.hex_cell(lat0, lon0, hex_res)
    s2c = s2.s2_cell(lat0, lon0, s2_level)
    pfx = cells.hex_prefix(hexc)
    return (
        batch.append_column("pc_tile", pa.array(np.where(ok, pc, -1).astype(np.int32)))
        .append_column("hex_r7", pa.array(np.where(ok, hexc, 0), pa.uint64()))
        .append_column("s2_l12", pa.array(np.where(ok, s2c, 0), pa.uint64()))
        .append_column("hex_prefix", pa.array(np.where(ok, pfx, 0), pa.uint32()))
    )


def tile_encode(ds, **kw):
    """Dataset op: rows with (lat, lon) -> + spatial key columns."""
    return ds.map_batches(lambda b: encode_batch(b, **kw), batch_format="pyarrow")
