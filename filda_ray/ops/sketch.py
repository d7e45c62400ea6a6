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

from filda_ray.ops import shuffle_partitions
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


class QuantileSketch:
    """KLL-style mergeable quantile sketch: level i holds items of
    weight 2^i; an over-full level sorts and keeps every other item
    (random offset), promoting them one level up.  Rank error is
    O(1/k) with k items per level; estimates are randomized, so (like
    any sampling sketch) they are not bit-stable under repartition —
    use the exact bottom-k path (queries.q_low_quantile) when exact
    answers are required.  Engine addition: the reference's only
    quantile (A3) is exact; at 100 TB a shuffle-free mergeable sketch
    is the scale path."""

    def __init__(self, k: int = 256, seed: int = 0):
        self.k = k
        self.levels = [np.empty(0, dtype=np.float64)]
        self.rng = np.random.RandomState(seed)

    def add(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        return self

    def _compact(self):
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                v = np.sort(self.levels[i])
                kept = v[self.rng.randint(2)::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])
            i += 1

    def merge(self, other: "QuantileSketch"):
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        vals = np.concatenate(self.levels)
        if vals.size == 0:
            return float("nan")
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, dtype=np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="mergesort")
        v, w = vals[order], wts[order]
        cum = np.cumsum(w)
        idx = np.searchsorted(cum, q * cum[-1])
        return float(v[min(idx, len(v) - 1)])

    def serialize(self) -> bytes:
        lens = np.array([len(lv) for lv in self.levels], dtype=np.int64)
        return (np.int64(len(lens)).tobytes() + lens.tobytes()
                + np.concatenate(self.levels).tobytes())

    @classmethod
    def deserialize(cls, blob: bytes, k: int = 256, seed: int = 0) -> "QuantileSketch":
        n_levels = int(np.frombuffer(blob[:8], dtype=np.int64)[0])
        lens = np.frombuffer(blob[8:8 + 8 * n_levels], dtype=np.int64)
        flat = np.frombuffer(blob[8 + 8 * n_levels:], dtype=np.float64)
        s = cls(k=k, seed=seed)
        s.levels = list(np.split(flat, np.cumsum(lens)[:-1])) if n_levels else [flat]
        return s


def approx_quantiles(ds, col: str, qs=(0.01, 0.5, 0.99), *, k: int = 256,
                     seed: int = 0) -> dict[float, float]:
    """Approximate quantiles of ``col``: one serialized KLL sketch per
    batch (map_batches), merged driver-side — no shuffle of raw rows;
    each sketch is O(k log(n/k)) floats."""

    def sketch(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        s = QuantileSketch(k=k, seed=seed).add(v)
        return pa.table({"sk": pa.array([s.serialize()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(sketch, batch_format="pyarrow")
    merged = QuantileSketch(k=k, seed=seed + 1)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("sk").to_pylist():
            merged.merge(QuantileSketch.deserialize(blob, k=k))
    return {float(q): merged.quantile(q) for q in qs}


def _hll_ranks(hashes: np.ndarray, p: int):
    """(register_index, rank) per hash — the vectorized core of
    hll_update without the dense register array."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    rank = np.ones(len(hashes), dtype=np.int64)
    v = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        rank += np.where(mask, shift, 0)
        v = np.where(mask, v << np.uint64(shift), v)
    return idx, np.minimum(rank, 64 - p + 1)


def _max_per_run(key1: np.ndarray, key2: np.ndarray, val: np.ndarray):
    """Max of ``val`` per (key1, key2) run: lexsort + reduceat.
    Returns (key1_run, key2_run, max_run)."""
    order = np.lexsort((val, key2, key1))
    k1, k2, v = key1[order], key2[order], val[order]
    starts = np.r_[0, np.flatnonzero((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])) + 1]
    # runs are sorted by val ascending -> the last element of each run
    # is the max
    ends = np.r_[starts[1:], len(v)] - 1
    return k1[starts], k2[starts], v[ends]


def approx_distinct_per_key(ds, key_col: str, col: str, *, p: int = 8,
                            seed: int = 0, n_buckets: int = 64):
    """Approximate distinct ``col`` per ``key_col`` (e.g. distinct
    urls per host at corpus scale) with SPARSE HLL registers: the
    shuffle carries one (key, register, rank) row per occupied
    register per key per batch (<= keys x min(2^p, values-per-key)),
    never one row per value and never a per-key Python loop; the
    bucket reduce is one lexsort + reduceat.  Estimates are identical
    to dense-register HLL (missing registers are zeros).  Returns
    Dataset(key, approx_n)."""
    import pandas as pd

    m = 1 << p

    def sketch(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            h = splitmix64(vals.astype(np.uint64) + np.uint64(seed))
        else:
            from ..kernels.hashing import content_hash64

            h = content_hash64([str(v) for v in vals], seed=seed)
        reg, rank = _hll_ranks(h, p)
        ks, rs, mx = _max_per_run(k, reg, rank)
        bk = (splitmix64(ks.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({key_col: pa.array(ks, pa.int64()),
                         "reg": pa.array(rs.astype(np.int32)),
                         "rank": pa.array(mx.astype(np.int8)),
                         "__bk": pa.array(bk)})

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks, _, mx = _max_per_run(g[key_col].to_numpy().astype(np.int64),
                                 g["reg"].to_numpy().astype(np.int64),
                                 g["rank"].to_numpy().astype(np.int64))
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        ends = np.r_[starts[1:], len(ks)]
        out_k = ks[starts]
        n_present = (ends - starts).astype(np.int64)
        inv_sum = np.add.reduceat(np.power(2.0, -mx.astype(np.float64)), starts)
        zeros = m - n_present
        est = _alpha(m) * m * m / (inv_sum + zeros)  # missing registers = 2^-0 each
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            est = np.where(small, m * np.log(m / np.maximum(zeros, 1)), est)
        return pd.DataFrame({key_col: out_k, "approx_n": est})

    return (
        ds.select_columns([key_col, col])
        .map_batches(sketch, batch_format="pyarrow")
        .groupby("__bk", num_partitions=shuffle_partitions())
        .map_groups(reduce_bucket, batch_format="pandas")
    )


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


# ---------------------------------------------------------------------------
# Heavy hitters: mergeable Misra–Gries summaries
# ---------------------------------------------------------------------------

# per-partial batch size: value_counts over this many rows per task
HH_BATCH_ROWS = 131072


def _mg_trim(keys: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra–Gries trim of an exact (keys, counts) summary to
    ``capacity`` counters: subtract the (capacity+1)-th largest count
    from every counter and drop the non-positive ones.  Returns
    (keys, adjusted_counts, err) where ``err`` is the subtracted
    amount — the summary's max undercount (Agarwal et al., "Mergeable
    Summaries", PODS 2012: trims compose under summary addition)."""
    if len(keys) <= capacity:
        return keys, counts, 0
    kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    adj = counts - kth
    keep = adj > 0
    return keys[keep], adj[keep], int(kth)


def approx_heavy_hitters(ds, col: str, *, capacity: int = 4096,
                         top_n: int | None = None):
    """Approximate per-key counts (heavy hitters) with a mergeable
    Misra–Gries sketch: exact ``value_counts`` per batch, trimmed to
    ``capacity`` counters, summed in a small groupby, trimmed once
    more.  Guarantees for every returned key:

        est_count ≤ true_count ≤ est_count + err_upper

    and every key with true_count > err_upper survives (err_upper ≤
    total_rows / capacity).  Raw values never shuffle — only ≤
    capacity rows per input batch (plus one error row each), so the
    exchange is bounded by blocks x capacity regardless of input
    size.  When ``capacity`` ≥ the true distinct count no trim ever
    fires and the result is EXACT with err_upper = 0 — which is what
    makes the operator SQL-oracle-checkable at test scale.

    Returns a pandas DataFrame ``(key, est_count, err_upper)`` sorted
    by est_count desc then key asc, limited to ``top_n`` if given.
    The final summary is ≤ capacity rows: a driver-side frame is the
    correct size, not a materialization compromise.
    """
    import pandas as pd

    from filda_ray.ops import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = batch.column(col).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        # null keys are excluded (the null slot is the error sentinel)
        vc = vc.filter(pc.is_valid(vc.field("values")))
        keys = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        k, c, err = _mg_trim(np.arange(len(keys)), counts, capacity)
        out = pa.table({
            "key": keys.take(pa.array(k)),
            "cnt": pa.array(c, pa.int64()),
            "err": pa.array(np.zeros(len(k), dtype=np.int64)),
        })
        if err:
            erow = pa.table({
                "key": pa.array([None], out.column("key").type),
                "cnt": pa.array([0], pa.int64()),
                "err": pa.array([err], pa.int64()),
            })
            out = pa.concat_tables([out, erow])
        return out

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=HH_BATCH_ROWS
    )
    # the summed summary is ≤ blocks x (capacity + 1) rows of
    # (key, int, int): sum it with one bounded groupby, then a single
    # driver-side trim of ≤ distinct-surviving-keys rows
    summed = parts.groupby("key", num_partitions=shuffle_partitions()).sum(["cnt", "err"])
    # stay in Arrow so an integer key column is never null-coerced to
    # float by a pandas round-trip
    import pyarrow.compute as pc

    batches = list(summed.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pd.DataFrame({"key": [], "est_count": np.array([], np.int64),
                             "err_upper": np.array([], np.int64)})
    t = pa.concat_tables(batches)
    nulls = pc.is_null(t.column("key"))
    err_total = pc.sum(pc.filter(t.column("sum(err)"), nulls)).as_py() or 0
    valid = t.filter(pc.invert(nulls))
    keys = valid.column("key").to_numpy(zero_copy_only=False)
    counts = valid.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
    idx, adj, err2 = _mg_trim(np.arange(len(keys)), counts, capacity)
    out = pd.DataFrame({
        "key": keys[idx],
        "est_count": adj,
        "err_upper": np.int64(err_total + err2),
    })
    out = out.sort_values(["est_count", "key"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    if top_n is not None:
        out = out.head(top_n).reset_index(drop=True)
    return out


def approx_quantiles_per_key(ds, key_col: str, col: str,
                             qs=(0.25, 0.5, 0.9), *, k: int = 256,
                             seed: int = 0):
    """Grouped approximate quantiles: one mergeable KLL sketch per
    (key, batch), merged per key in a bounded groupby.  Raw values
    never shuffle — only O(k log(n/k))-float sketch blobs, so the
    exchange volume is keys x sketch size regardless of row count.

    Estimator: nearest-rank (value at rank ceil(q*n)); EXACT whenever
    a key's total count ≤ ``k`` (no compaction ever fires), which is
    what makes the operator SQL-oracle-checkable on the events table;
    beyond k it degrades to KLL rank error O(1/k).  NaNs are dropped
    per sketch (SQL ``value IS NOT NULL`` semantics).

    Output: one row per key with float columns ``q<percent>`` (e.g.
    q25, q50, q90).
    """
    from filda_ray.ops import pd_table, shuffle_partitions

    qcols = [f"q{int(round(q * 100))}" for q in qs]

    def sk_partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        ks, vs = keys[order], vals[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]]) if len(ks) else np.empty(0, np.int64)
        bounds = np.r_[starts, len(ks)]
        out_keys, blobs = [], []
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            out_keys.append(ks[s])
            blobs.append(QuantileSketch(k=k, seed=seed).add(vs[s:e]).serialize())
        return pa.table({
            "key": pa.array(out_keys, batch.column(key_col).type),
            "sk": pa.array(blobs, pa.binary()),
        })

    def merge_key(g) -> "pd.DataFrame":
        import pandas as pd

        s = QuantileSketch(k=k, seed=seed + 1)
        for blob in g["sk"]:
            s.merge(QuantileSketch.deserialize(blob, k=k))
        row = {key_col: [g["key"].iloc[0]]}
        for q, c in zip(qs, qcols):
            row[c] = [s.quantile(q)]
        return pd_table(pd.DataFrame(row))

    parts = ds.select_columns([key_col, col]).map_batches(
        sk_partial, batch_format="pyarrow", batch_size=HH_BATCH_ROWS
    )
    return parts.groupby("key", num_partitions=shuffle_partitions()).map_groups(
        merge_key, batch_format="pandas"
    )
