"""Ingest normalization stage.

Reference analogs:
- scale/offset decode + masked->NaN (read_viirs_*, FILDA_IO.py:605,
  :631-644), fill value -999 (FILDA.py:922-927, :1517), QA-flag
  invalidation (FILDA_IO.py:404-412) -> ``normalize_columns``:
  fill-value -> null, affine rescale, predicate invalidation, all as
  one vectorized Arrow pass.
- collection-dependent dataset path / var rename
  (update_params_for_collection, FILDA_NTL.py:22-40) ->
  ``rename_map`` schema-evolution shim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_batch(batch: pa.Table, *, rename: dict[str, str] | None = None,
                    fill_values: dict[str, float] | None = None,
                    scale_offset: dict[str, tuple[float, float]] | None = None,
                    invalidate: dict[str, str] | None = None) -> pa.Table:
    """One-pass ingest normalization.

    - ``rename``: old -> new column names (schema evolution across
      file versions)
    - ``fill_values``: col -> sentinel replaced by null (the -999/NaN
      convention becomes an Arrow validity bitmap)
    - ``scale_offset``: col -> (scale, offset): x*scale + offset
    - ``invalidate``: col -> name of a boolean column; where the flag
      is TRUE the value becomes null (QA invalidation)
    """
    out = batch
    if rename:
        out = out.rename_columns([rename.get(c, c) for c in out.column_names])
    for col, sentinel in (fill_values or {}).items():
        arr = out.column(col)
        mask = pc.equal(arr, pa.scalar(sentinel, arr.type))
        out = out.set_column(out.schema.get_field_index(col), col,
                             pc.if_else(pc.fill_null(mask, False), pa.scalar(None, arr.type), arr))
    for col, (scale, offset) in (scale_offset or {}).items():
        arr = pc.cast(out.column(col), pa.float64())
        arr = pc.add(pc.multiply(arr, pa.scalar(float(scale))), pa.scalar(float(offset)))
        out = out.set_column(out.schema.get_field_index(col), col, arr)
    for col, flag_col in (invalidate or {}).items():
        arr = out.column(col)
        flag = pc.fill_null(out.column(flag_col), False)
        out = out.set_column(out.schema.get_field_index(col), col,
                             pc.if_else(flag, pa.scalar(None, arr.type), arr))
    return out


def normalize_op(ds, **kw):
    return ds.map_batches(lambda b: normalize_batch(b, **kw), batch_format="pyarrow")
