"""Grouped second-order statistics and multi-granularity aggregates.

Reference analog: the per-tile moment accumulations behind FILDA's
background characterization (mean/std per context window,
FILDA.py:1264-1378) generalized to the relational surface:

- ``grouped_comoments``: one-pass partial co-moment sums
  (n, Σx, Σy, Σx², Σy², Σxy) per block — the ONLY stage that sees raw
  rows — merged by a small groupby.  corr / covar / regression
  slope+intercept derive from the merged sums in a finalize stage.
  At 100 TB the shuffle moves ≤ groups×blocks tiny partial rows.
- ``arg_extreme_per_group``: distributed argmax/argmin (SQL
  max_by/min_by) with a deterministic tie-break: each block reduces
  to one candidate winner per group BEFORE the shuffle, so the
  groupby sees ≤ groups-per-block rows, payload columns ride along.
- ``rollup_sums``: GROUP BY ROLLUP(k1, k2, ...) from ONE
  finest-granularity shuffle; every coarser level re-aggregates the
  previous level's (already tiny) output, never the raw input.

All sums are int64 so partial-merge order cannot perturb the result
(callers quantize continuous values, e.g. cents); the float math
happens once, in the finalize stage, with a fixed expression shape so
a SQL oracle computing from the same integer sums hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import pd_table, shuffle_partitions

PARTIAL_BATCH_ROWS = 65536  # decouple partial density from block layout


def grouped_comoments(ds, *, group_cols: list[str], x_col: str, y_col: str):
    """(group, n, sx, sy, sxx, syy, sxy) with int64 sums.

    Inputs must already be integer-valued (quantized upstream); the
    per-block partial uses Arrow's hash aggregation, so a block with
    many rows still emits one row per (block, group).
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            **{g: b.column(g) for g in group_cols},
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y),
        })
        g = t.group_by(group_cols).aggregate(
            [("one", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(group_cols + ["n", "sx", "sy", "sxx", "syy", "sxy"])

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=PARTIAL_BATCH_ROWS)
    return pre.groupby(group_cols, num_partitions=shuffle_partitions()).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))


def comoment_finalize(b: pa.Table) -> pa.Table:
    """corr, covar_samp, regr_slope, regr_intercept from merged sums.

    Expression shape is pinned (docstring contract): the SQL oracle
    must compute the same sequence over the same bigint sums for
    bit-equality.  Degenerate groups (n<2 or zero variance) -> null.
    """
    n = b.column("n").to_numpy().astype(np.float64)
    sx = b.column("sx").to_numpy().astype(np.float64)
    sy = b.column("sy").to_numpy().astype(np.float64)
    sxx = b.column("sxx").to_numpy().astype(np.float64)
    syy = b.column("syy").to_numpy().astype(np.float64)
    sxy = b.column("sxy").to_numpy().astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        cxy = sxy - sx * sy / n
        cxx = sxx - sx * sx / n
        cyy = syy - sy * sy / n
        covar = np.where(n > 1, cxy / (n - 1.0), np.nan)
        denom = np.sqrt(cxx) * np.sqrt(cyy)
        corr = np.where((n > 1) & (denom > 0), cxy / denom, np.nan)
        slope = np.where(cxx > 0, cxy / cxx, np.nan)
        intercept = np.where(cxx > 0, (sy - (cxy / cxx) * sx) / n, np.nan)
    keep = [c for c in b.column_names if c not in
            ("sx", "sy", "sxx", "syy", "sxy")]
    out = {c: b.column(c) for c in keep}
    out.update(corr=pa.array(corr), covar_samp=pa.array(covar),
               slope=pa.array(slope), intercept=pa.array(intercept))
    return pa.table(out)


def arg_extreme_per_group(ds, *, group_col: str, value_col: str,
                          tie_col: str, ascending: bool = False):
    """Row with the max (min if ``ascending``) value per group —
    SQL max_by/min_by over every payload column, deterministic via
    ``tie_col`` (smallest wins among equals).

    Two-level reduce: a per-block winner per group first (no shuffle,
    output ≤ groups-in-block rows), then one tiny groupby.
    """
    by = [value_col, tie_col]
    asc = [ascending, True]

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        w = (g.sort_values(by, ascending=asc, kind="mergesort")
              .groupby(group_col, as_index=False, sort=False).head(1))
        return pd_table(w.reset_index(drop=True))

    pre = ds.map_batches(winners, batch_format="pandas",
                         batch_size=PARTIAL_BATCH_ROWS)

    # bucketed final reduce: `winners` is already multi-group-safe, so
    # the shuffle groups are 16x-oversampled hash buckets — one pandas
    # sort per bucket instead of a Python dispatch per distinct group
    from ..kernels.hashing import splitmix64

    nb = shuffle_partitions()

    def add_bk(b: pa.Table) -> pa.Table:
        col = b.column(group_col)
        if pa.types.is_integer(col.type):
            u = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            from ..kernels.hashing import col_hash64

            u = col_hash64(col.cast(pa.string()).combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col)
        return b.append_column(
            "__bk", pa.array((splitmix64(u) % np.uint64(16 * nb)).astype(np.int64)))

    def winners_drop_bk(g: pd.DataFrame) -> pd.DataFrame:
        return winners(g.drop(columns="__bk"))

    return (pre.map_batches(add_bk, batch_format="pyarrow")
            .groupby("__bk", num_partitions=nb)
            .map_groups(winners_drop_bk, batch_format="pandas"))


def mode_per_group(ds, *, group_col: str, value_col: str,
                   count_col: str = "n_occ"):
    """Most frequent value per group (SQL mode with a deterministic
    tie-break: smallest value among equally frequent).  Two shuffles,
    both tiny past the first partial: per-block (group, value) counts
    -> merged counts -> distributed argmax on the count."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b.column(group_col),
                      value_col: b.column(value_col),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        g = t.group_by([group_col, value_col]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, value_col, count_col])

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=PARTIAL_BATCH_ROWS)
    merged = counts.groupby([group_col, value_col],
                            num_partitions=shuffle_partitions()).aggregate(
        Sum(count_col, alias_name=count_col))
    return arg_extreme_per_group(merged, group_col=group_col,
                                 value_col=count_col, tie_col=value_col)


def cube_sums(ds, *, key_cols: list[str], key_types: dict, value_col: str,
              count_col: str = "n", sum_col: str = "total"):
    """GROUP BY CUBE(*key_cols): every key subset's totals — the
    full-lattice special case of ``grouping_sets_sums`` (one full
    shuffle at the finest level; each of the 2^k - 1 coarser sets
    re-aggregates its tiny output).  k is small by construction (2-4
    keys); rolled-up key columns come back null (SQL CUBE
    semantics)."""
    from itertools import combinations

    sets = [list(sub) for r in range(len(key_cols), -1, -1)
            for sub in combinations(key_cols, r)]
    out = grouping_sets_sums(ds, sets=sets, key_types=key_types,
                             value_col=value_col, count_col=count_col,
                             sum_col=sum_col)
    return out.select_columns(list(key_cols) + [count_col, sum_col])


def rollup_sums(ds, *, key_cols: list[str], key_types: dict, value_col: str,
                count_col: str = "n", sum_col: str = "total"):
    """GROUP BY ROLLUP(*key_cols) over an int64 value: finest level is
    the only full shuffle; each coarser level (keys[:-1], keys[:-2],
    ..., grand total) re-aggregates the PREVIOUS level's output, whose
    row count is the finest-group cardinality, not the input's.
    Rolled-up key columns come back null (SQL ROLLUP semantics).

    ``key_types`` maps key -> pyarrow type so null placeholder columns
    type-match across levels without a driver-side schema probe (which
    would execute part of a lazy plan — see the round-3 gotcha).
    """
    from ray.data.aggregate import Count, Sum

    finest = ds.groupby(key_cols, num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name=count_col), Sum(value_col, alias_name=sum_col))

    def with_nulls(b: pa.Table, present: list[str]) -> pa.Table:
        cols = {}
        for k in key_cols:
            if k in present:
                cols[k] = b.column(k).cast(key_types[k])
            else:
                cols[k] = pa.nulls(len(b), key_types[k])
        cols[count_col] = b.column(count_col).cast(pa.int64())
        cols[sum_col] = b.column(sum_col).cast(pa.int64())
        return pa.table(cols)

    levels = [finest.map_batches(lambda b: with_nulls(b, key_cols),
                                 batch_format="pyarrow")]
    prev = finest
    for i in range(len(key_cols) - 1, 0, -1):
        keys = key_cols[:i]
        agg = prev.groupby(keys, num_partitions=shuffle_partitions(64)).aggregate(
            Sum(count_col, alias_name=count_col), Sum(sum_col, alias_name=sum_col))
        keys_now = list(keys)
        levels.append(agg.map_batches(
            lambda b, present=keys_now: with_nulls(b, present),
            batch_format="pyarrow"))
        prev = agg

    # grand total: reduce the coarsest level's handful of rows to one
    def to_total(b: pa.Table) -> pa.Table:
        t = pa.table({count_col: pa.array([b.column(count_col).to_numpy().sum()], pa.int64()),
                      sum_col: pa.array([b.column(sum_col).to_numpy().sum()], pa.int64())})
        return with_nulls(t, [])

    levels.append(prev.repartition(1).map_batches(to_total, batch_format="pyarrow",
                                                  batch_size=None))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _grouped_value_hist(ds, group_col: str, value_col: str):
    """Shared (group, value) -> count histogram pipeline for the exact
    median/quantile aggregates: per-block Arrow count partials, one
    Sum-merge shuffle, then bounded group-hash buckets so the finalize
    kernel runs once per bucket.  Returns (bucketed_groupby, nb)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b.column(group_col),
                      value_col: b.column(value_col),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        g = t.group_by([group_col, value_col]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, value_col, "__n"])

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=PARTIAL_BATCH_ROWS)
    merged = hist.groupby([group_col, value_col],
                          num_partitions=shuffle_partitions()).aggregate(
        Sum("__n", alias_name="__n"))
    nb = 16 * shuffle_partitions()

    def add_bk(b: pa.Table) -> pa.Table:
        return b.append_column("__bk", pa.array(_group_bucket(b, group_col, nb)))

    return (merged.map_batches(add_bk, batch_format="pyarrow").groupby(
        "__bk", num_partitions=shuffle_partitions(nb)), nb)


def _group_bucket(b: pa.Table, group_col: str, nb: int) -> np.ndarray:
    """Bounded hash bucket of a group-key column (int or string) so a
    finalize stage processes MANY groups per vectorized call instead of
    one Python dispatch per group."""
    from ..kernels.hashing import content_hash64, splitmix64

    col = b.column(group_col)
    if pa.types.is_integer(col.type):
        h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    else:
        h = content_hash64(col.to_pylist())
    return (h % np.uint64(nb)).astype(np.int32)


def grouped_median_exact(ds, *, group_col: str, value_col: str):
    """Exact per-group median + MAD (SQL ``median(v), mad(v) GROUP BY
    g``) without ever shuffling raw rows: per-block (group, value) ->
    count histogram partials, one tiny groupby merge, then the shared
    weighted-median kernel — ONE call per group-hash bucket, never a
    per-group Python dispatch.

    Contract (same as the PC background path, background.py): the
    value domain per group must be bounded — integers, categorical
    codes, or pre-quantized floats — so histogram rows are <= groups x
    distinct-values.  For unbounded continuous domains use the KLL
    sketch (ops.sketch.grouped_quantiles) instead; this op is the
    EXACT path.  Output: (group, median_v, mad_v, n).

    Reference analog: the contextual median/MAD backbone
    (FILDA.py:857-864) as a general relational aggregate.
    """
    from ..kernels.stats import grouped_weighted_median_mad

    bucketed, _ = _grouped_value_hist(ds, group_col, value_col)

    def finalize_bucket(g: pd.DataFrame) -> pa.Table:
        owners, uniq = pd.factorize(g[group_col], sort=True)
        med, mad, tot = grouped_weighted_median_mad(
            owners.astype(np.int64),
            g[value_col].to_numpy(np.float64),
            g["__n"].to_numpy(np.int64), len(uniq))
        return pd_table(pd.DataFrame({
            group_col: uniq, "median_v": med, "mad_v": mad, "n": tot}))

    return bucketed.map_groups(finalize_bucket, batch_format="pandas")


def grouped_quantiles_exact(ds, *, group_col: str, value_col: str,
                            probs=(0.25, 0.5, 0.75)):
    """Exact per-group quantile_cont (linear interpolation) over a
    bounded value domain, via the same histogram pipeline as
    ``grouped_median_exact``.  Output: (group, q<p*100>..., n).
    Unbounded continuous domains belong to the KLL sketch path."""
    from ..kernels.stats import grouped_weighted_quantiles

    bucketed, _ = _grouped_value_hist(ds, group_col, value_col)
    qcols = [f"q{int(round(p * 100)):02d}" for p in probs]

    def finalize_bucket(g: pd.DataFrame) -> pa.Table:
        owners, uniq = pd.factorize(g[group_col], sort=True)
        owners = owners.astype(np.int64)
        qs = grouped_weighted_quantiles(
            owners, g[value_col].to_numpy(np.float64),
            g["__n"].to_numpy(np.int64), len(uniq), list(probs))
        out = {group_col: uniq}
        for i, qc in enumerate(qcols):
            out[qc] = qs[:, i]
        out["n"] = np.bincount(owners, weights=g["__n"].to_numpy(np.int64),
                               minlength=len(uniq)).astype(np.int64)
        return pd_table(pd.DataFrame(out))

    return bucketed.map_groups(finalize_bucket, batch_format="pandas")


def grouping_sets_sums(ds, *, sets: list[list[str]], key_types: dict,
                       value_col: str, count_col: str = "n",
                       sum_col: str = "total"):
    """GROUP BY GROUPING SETS(...): arbitrary user-chosen key subsets,
    all derived from ONE full shuffle — the finest groupby over the
    union of every set's keys; each requested set re-aggregates that
    tiny output (cube_sums is the full-lattice special case; rollup
    keeps its own previous-level re-aggregation chain).  Keys absent
    from a set come back null, SQL semantics."""
    from ray.data.aggregate import Count, Sum

    all_keys = sorted({k for st in sets for k in st})
    assert all_keys, "grouping sets need at least one key"
    finest = ds.groupby(all_keys, num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name=count_col), Sum(value_col, alias_name=sum_col))

    def with_nulls(b: pa.Table, present: list[str]) -> pa.Table:
        cols = {}
        for k in all_keys:
            if k in present:
                cols[k] = b.column(k).cast(key_types[k])
            else:
                cols[k] = pa.nulls(len(b), key_types[k])
        cols[count_col] = b.column(count_col).cast(pa.int64())
        cols[sum_col] = b.column(sum_col).cast(pa.int64())
        return pa.table(cols)

    def to_total(b: pa.Table) -> pa.Table:
        t = pa.table({count_col: pa.array([b.column(count_col).to_numpy().sum()], pa.int64()),
                      sum_col: pa.array([b.column(sum_col).to_numpy().sum()], pa.int64())})
        return with_nulls(t, [])

    levels = []
    for st in sets:
        keys = sorted(st)
        if not keys:
            levels.append(finest.repartition(1).map_batches(
                to_total, batch_format="pyarrow", batch_size=None))
        elif keys == all_keys:
            levels.append(finest.map_batches(
                lambda b, present=keys: with_nulls(b, present),
                batch_format="pyarrow"))
        else:
            agg = finest.groupby(keys, num_partitions=shuffle_partitions(64)).aggregate(
                Sum(count_col, alias_name=count_col),
                Sum(sum_col, alias_name=sum_col))
            levels.append(agg.map_batches(
                lambda b, present=keys: with_nulls(b, present),
                batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
