"""Bloom-filter join pre-filtering: exact semi/anti joins that avoid
shuffling the big side.

At 100 TB the dominant cost of ``big SEMI JOIN small`` is moving the
big side through an all-to-all exchange.  A Bloom filter over the
small side's keys is mergeable (bitwise OR), a few bits per key, and
has no false negatives — so the big side can be pre-filtered with a
broadcast bitset *before* any shuffle, and only the tiny surviving
fraction pays for exact verification.  The reference's background-set
exclusion joins (anti-join against fire/cloud cells, FILDA.py:637-652)
are the semantics; the Bloom stage is the web-scale execution plan.

Design (all stages stream):

1. **build** — ``map_batches`` over the key side emits sparse
   ``(word, or-value)`` partials (per-batch ``bitwise_or.reduceat``),
   a bounded ``groupby(word % R)`` OR-merges them, and the driver
   assembles the dense bitset (≤ 2x the filter's own size — the same
   order as the ``ray.put`` broadcast the filter needs anyway).
2. **pre-filter** — broadcast the bitset; membership test is k
   dense-array gathers per batch, fully vectorized.
3. **verify** — exact membership for the Bloom-positive survivors:
   broadcast key set when the key side is small, else a native
   hash-partitioned ``left_semi`` / ``left_anti`` join.  Either way
   the result is EXACT (false positives are removed), so the operator
   is SQL-oracle-checkable.

Partitioning assumption: none on the big side (it never shuffles in
the broadcast-verify path); the join-verify path hash-partitions only
the survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from filda_ray.kernels.hashing import content_hash64, splitmix64
from filda_ray.ops import input_size_bytes, shuffle_partitions

# per-key sizing: 12 bits/key + 7 hashes ≈ 0.3% false-positive rate
BITS_PER_KEY = 12
DEFAULT_HASHES = 7
# right sides below this (bytes, plan metadata) verify by broadcast
# key set; larger ones by native hash semi/anti join
BROADCAST_VERIFY_MAX_BYTES = 512 << 20
BUILD_BATCH_ROWS = 65536


def key_hash_u64(arr) -> np.ndarray:
    """uint64 base hash of a key column (Arrow array or ChunkedArray).

    Integers go through splitmix64 (cheap, well-mixed); strings/binary
    through the C-backed blake2b ``content_hash64``.  Nulls hash to a
    fixed sentinel — exactness is restored by the verify stage, which
    treats null keys as non-matching (SQL ``IN`` semantics).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_integer(t):
        v = arr.to_numpy(zero_copy_only=False)
        return splitmix64(np.nan_to_num(v).astype(np.int64).astype(np.uint64))
    if pa.types.is_floating(t):
        v = np.nan_to_num(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        return splitmix64(v.view(np.uint64))
    return content_hash64(arr.to_pylist())


def _positions(h: np.ndarray, num_bits: int, num_hashes: int, seed: int):
    """(n, k) bit positions via double hashing (Kirsch–Mitzenmacher:
    two independent hashes generate k without k hash passes).
    ``num_bits`` must be a power of two so mod is a mask."""
    mask = np.uint64(num_bits - 1)
    h1 = splitmix64(h ^ np.uint64(seed * 2 + 1))
    h2 = splitmix64(h ^ np.uint64(seed * 2 + 2)) | np.uint64(1)
    out = np.empty((num_hashes, len(h)), dtype=np.uint64)
    acc = h1.copy()
    for i in range(num_hashes):
        out[i] = acc & mask
        with np.errstate(over="ignore"):
            acc += h2
    return out


class Bloom:
    """Immutable built filter: dense uint64 words + parameters."""

    __slots__ = ("words", "num_bits", "num_hashes", "seed")

    def __init__(self, words: np.ndarray, num_bits: int, num_hashes: int, seed: int):
        self.words = words
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.seed = seed

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership for an array of uint64 key hashes."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(h, self.num_bits, self.num_hashes, self.seed)
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.num_hashes):
            p = pos[i]
            w = self.words[(p >> np.uint64(6)).astype(np.int64)]
            hit &= ((w >> (p & np.uint64(63))) & np.uint64(1)).astype(bool)
        return hit


def _size_bits(expected_keys: int) -> int:
    """Power-of-two bit count ≥ expected_keys * BITS_PER_KEY."""
    want = max(1024, expected_keys * BITS_PER_KEY)
    return 1 << int(np.ceil(np.log2(want)))


def bloom_build(ds, col: str, *, num_bits: int | None = None,
                num_hashes: int = DEFAULT_HASHES, seed: int = 0,
                expected_keys: int | None = None) -> Bloom:
    """Distributed Bloom build over a Dataset column.

    Sparse ``(word, value)`` partials per batch, OR-merged in a
    bounded bucket groupby, assembled dense on the driver.  Driver
    traffic ≤ 16 bytes x occupied words ≤ 2x the dense bitset — the
    bitset is about to be ``ray.put`` broadcast anyway, so the
    assembly does not change the memory order of the operator.
    """
    if num_bits is None:
        n = expected_keys if expected_keys is not None else ds.count()
        num_bits = _size_bits(int(n))
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    n_buckets = shuffle_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch.column(col))
        pos = _positions(h, num_bits, num_hashes, seed).ravel()
        words = (pos >> np.uint64(6)).astype(np.int64)
        bits = (np.uint64(1) << (pos & np.uint64(63))).view(np.int64)
        order = np.argsort(words, kind="stable")
        words, bits = words[order], bits[order]
        starts = np.flatnonzero(np.r_[True, words[1:] != words[:-1]])
        orred = np.bitwise_or.reduceat(bits, starts) if len(words) else bits
        return pa.table({
            "w": pa.array(words[starts], type=pa.int64()),
            "v": pa.array(orred, type=pa.int64()),
            "bk": pa.array(words[starts] % n_buckets, type=pa.int32()),
        })

    def or_bucket(g: pd.DataFrame) -> pd.DataFrame:
        words = g["w"].to_numpy()
        vals = g["v"].to_numpy()
        order = np.argsort(words, kind="stable")
        words, vals = words[order], vals[order]
        starts = np.flatnonzero(np.r_[True, words[1:] != words[:-1]])
        return pd.DataFrame({
            "w": words[starts],
            "v": np.bitwise_or.reduceat(vals, starts) if len(words) else vals,
        })

    sparse = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=BUILD_BATCH_ROWS)
        .groupby("bk", num_partitions=shuffle_partitions())
        .map_groups(or_bucket, batch_format="pandas")
    )
    dense = np.zeros(num_bits // 64, dtype=np.uint64)
    for b in sparse.iter_batches(batch_format="pyarrow"):
        dense[b.column("w").to_numpy()] |= b.column("v").to_numpy().view(np.uint64)
    return Bloom(dense, num_bits, num_hashes, seed)


def bloom_prefilter(ds, bloom: Bloom, *, on: str, keep: str = "maybe"):
    """Filter a stream through a broadcast Bloom filter.

    ``keep="maybe"`` keeps Bloom-positive rows (semi pre-filter,
    superset of true matches); ``keep="definitely_not"`` keeps
    Bloom-negative rows (anti fast-keeps, exact — no false negatives).
    """
    import ray

    from .workercache import worker_state

    ref = ray.put((bloom.words, bloom.num_bits, bloom.num_hashes, bloom.seed))

    def f(batch: pa.Table) -> pa.Table:
        bl = worker_state(ref, lambda: Bloom(*ray.get(ref)))
        hit = bl.contains(key_hash_u64(batch.column(on)))
        return batch.filter(pa.array(hit if keep == "maybe" else ~hit))

    return ds.map_batches(f, batch_format="pyarrow")


def bloom_semi_anti_join(left, right, *, on: str, right_on: str | None = None,
                         anti: bool = False, num_hashes: int = DEFAULT_HASHES,
                         seed: int = 0, verify: str = "auto"):
    """EXACT semi/anti join with a Bloom pre-filter on the big side.

    ``verify``: "broadcast" collects the distinct right-key array and
    filters survivors in-stream (right side small); "join" runs a
    native hash-partitioned left_semi / left_anti on the survivors
    (right side large); "auto" picks by the right side's plan-metadata
    size.  Both paths remove every false positive, so the result
    equals the plain semi/anti join — verified by the SQL oracle.
    """
    from . import relational as rel

    right_on = right_on or on
    rkeys = right.select_columns([right_on])
    # one narrow materialize of the KEY COLUMN ONLY: reused by the
    # count (sizing), the bloom build, and the verify stage
    rkeys = rkeys.materialize()
    bloom = bloom_build(rkeys, right_on, num_hashes=num_hashes, seed=seed)

    if verify == "auto":
        sz = input_size_bytes(rkeys)
        verify = "broadcast" if (sz is not None and sz <= BROADCAST_VERIFY_MAX_BYTES) else "join"

    maybe = bloom_prefilter(left, bloom, on=on, keep="maybe")
    if anti:
        definite = bloom_prefilter(left, bloom, on=on, keep="definitely_not")

    if verify == "broadcast":
        import pyarrow.compute as pc

        kt = pa.concat_tables(rkeys.iter_batches(batch_format="pyarrow"))
        karr = pc.drop_null(kt.column(right_on)).to_numpy(zero_copy_only=False)
        out = rel.semi_anti_filter(maybe, np.unique(karr), on=on, anti=anti)
    else:
        distinct = rel.distinct_rows(rkeys, [right_on])
        out = maybe.join(distinct, join_type="left_anti" if anti else "left_semi",
                         num_partitions=shuffle_partitions(), on=(on,),
                         right_on=(right_on,))
    if anti:
        out = definite.union(out)
    return out
