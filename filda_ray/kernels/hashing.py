"""Deterministic hashing kernels.

The reference uses exact coordinate identity for dedup
(``np.unique(axis=0)``, FILDA.py:395-398, 491-497); at web scale the
identity key becomes a content hash.  Two tiers:

- ``md5_hex``: per-row md5 hex digest; chosen because DuckDB exposes
  ``md5()`` so the exact-dedup operator is oracle-checkable in SQL.
- ``content_hash64`` / ``splitmix64``: fast 64-bit hashes for the
  scale path (hash-partition keys, LSH band hashes, salting).
"""

from __future__ import annotations

import hashlib

import numpy as np

# splitmix64 constants (public domain; Steele, Lea, Flood 2014)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 hash arrays."""
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(np.uint64) ^ (splitmix64(b.astype(np.uint64)) + _SM_GAMMA))


def content_hash64(values, *, seed: int = 0) -> np.ndarray:
    """64-bit blake2b content hash per element (str or bytes).

    Per-row C-backed digest; used for dedup keys and hash partitioning.
    """
    salt = seed.to_bytes(8, "little")
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        if isinstance(v, str):
            v = v.encode("utf-8")
        out[i] = int.from_bytes(hashlib.blake2b(v, digest_size=8, salt=salt).digest(), "little")
    return out


def col_hash64(col) -> np.ndarray:
    """uint64 hash of an Arrow column of ANY type, for shuffle-bucket
    assignment (equal values -> equal hash; distribution via a final
    splitmix64 at the call site).  Numeric/temporal columns hash their
    64-bit value bits zero-copy-ish; strings/binary/other go through
    pandas' C string hasher (``pd.util.hash_array``, fixed key —
    deterministic across processes, unlike Python ``hash``)."""
    import pyarrow as pa

    t = col.type
    if pa.types.is_temporal(t):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    elif (pa.types.is_integer(t) or pa.types.is_floating(t)
          or pa.types.is_boolean(t)):
        v = col.to_numpy(zero_copy_only=False)
    else:
        import pandas as pd

        arr = np.asarray(col.to_pandas(), dtype=object)
        return pd.util.hash_array(arr, categorize=False).astype(np.uint64)
    if v.dtype.kind == "f":  # nullable ints surface as float64 + NaN
        v = v.astype(np.float64)
        v = np.where(v == 0.0, 0.0, v)  # -0.0 == 0.0 must co-bucket
        return v.view(np.uint64)
    if v.dtype.kind == "b":
        return v.astype(np.uint64)
    return v.astype(np.int64).view(np.uint64)


def md5_hex(values) -> np.ndarray:
    """Per-element md5 hex digest (matches DuckDB ``md5()``)."""
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        if v is None:
            out[i] = None
            continue
        if isinstance(v, str):
            v = v.encode("utf-8")
        out[i] = hashlib.md5(v).hexdigest()
    return out


def md5_hex64(values):
    """(hex digests, uint64 of the first 8 digest bytes) in one pass —
    the numeric twin feeds shuffle-bucket assignment without a second
    per-row hash."""
    hexes = np.empty(len(values), dtype=object)
    h64 = np.zeros(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            hexes[i] = None
            continue
        if isinstance(v, str):
            v = v.encode("utf-8")
        d = hashlib.md5(v).digest()
        hexes[i] = d.hex()
        h64[i] = int.from_bytes(d[:8], "little")
    return hexes, h64


def salt_for(keys: np.ndarray, n_salts: int, *, seed: int = 7) -> np.ndarray:
    """Deterministic salt in [0, n_salts) per row, for splitting hot keys.

    Mega-cell salting per BASELINE.json north_rule: a skewed partition
    key gains a salt suffix so one hot key spreads over ``n_salts``
    shuffle partitions.
    """
    h = splitmix64(keys.astype(np.uint64) + np.uint64(seed))
    return (h % np.uint64(n_salts)).astype(np.int32)
