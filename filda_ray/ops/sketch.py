"""Mergeable sketches (engine additions; the reference has none —
SURVEY.md §2.5 notes no approximate aggregates exist — but a 100 TB
training-data pipeline needs cardinality/quantile estimates that merge
across blocks without a shuffle of raw rows).

HyperLogLog: classic m=2^p registers, vectorized numpy update; one
serialized register array per batch, max-merged in a tiny final step —
the 'emit one sketch per batch and merge' pattern from the Ray guide.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import splitmix64

DEFAULT_P = 12  # 4096 registers, ~1.6% relative error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_update(registers: np.ndarray, hashes: np.ndarray, p: int = DEFAULT_P):
    """Update registers in place with uint64 hashes (vectorized)."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits + 1
    rank = np.ones(len(hashes), dtype=np.int64)
    v = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        rank += np.where(mask, shift, 0)
        v = np.where(mask, v << np.uint64(shift), v)
    rank = np.minimum(rank, 64 - p + 1)
    np.maximum.at(registers, idx, rank.astype(registers.dtype))
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    m = registers.shape[0]
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:  # small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, *, p: int = DEFAULT_P, seed: int = 0) -> float:
    """Approximate distinct count of ``col``: one HLL register array
    per batch (map_batches), max-merge of the tiny sketches.  No
    shuffle of raw values; sketches are (2^p)-byte blobs."""

    def sketch(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            h = splitmix64(vals.astype(np.uint64) + np.uint64(seed))
        else:
            from ..kernels.hashing import content_hash64

            h = content_hash64([str(v) for v in vals], seed=seed)
        regs = np.zeros(1 << p, dtype=np.uint8)
        hll_update(regs, h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(sketch, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(merged)
