"""Statistical kernels mirroring the reference's aggregate semantics.

- median/MAD background stats   (FILDA.py:857-864, cal_bgstat)
- trimmed lowest-frac mean      (FILDA.py:1335-1368, lowest-25% FRP bg)
- lowest-1%-quantile threshold  (FILDA.py:174-177, DNB dynamic floor)
- gamma log-moment estimator    (FILDA_NTL.py:252-267, climatology)
- combinable moment partials    (engine addition: partial aggregation
  before the groupby shuffle, per ray_guide 'Aggregation at scale')

All interpolation follows numpy's default (linear, matching DuckDB's
``median``/``quantile_cont``) so SQL oracles agree bit-for-bit on the
same input multisets.
"""

from __future__ import annotations

import numpy as np

MAD_SCALE = 1.4826  # consistency constant: MAD -> sigma under normality


def median_mad(values: np.ndarray):
    """(median, MAD) ignoring NaN.  MAD = median(|x - median(x)|)
    (unscaled, exactly DuckDB's ``mad``); reference: FILDA.py:857-864."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return np.nan, np.nan
    med = float(np.median(v))
    return med, float(np.median(np.abs(v - med)))


def robust_z(values: np.ndarray, med: np.ndarray, mad: np.ndarray,
             eps: float = 1e-9) -> np.ndarray:
    """Robust z-score: (x - median) / (1.4826 * MAD + eps)."""
    return (np.asarray(values, dtype=np.float64) - med) / (MAD_SCALE * np.asarray(mad) + eps)


def trimmed_low_mean(values: np.ndarray, frac: float = 0.25):
    """Mean of the lowest ``frac`` fraction (at least 1 element) of the
    non-NaN values, plus the count used.

    Reference: FILDA.py:1362-1368 sorts the window and averages the
    lowest 25% of background radiances.  Selection is by sort order
    (k = max(1, floor(n*frac)) smallest elements), not by quantile
    interpolation — mirrored in SQL via row_number() over order.
    """
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return np.nan, 0
    k = max(1, int(np.floor(v.size * frac)))
    low = np.partition(v, k - 1)[:k]
    return float(np.mean(low)), k


def low_quantile_threshold(values: np.ndarray, frac: float = 0.01,
                           floor: float | None = None):
    """Mean of the lowest ``frac`` of values, clamped to ``floor``.

    Reference: FILDA.py:174-190 (global 1% DNB threshold, clamp >= 4).
    """
    m, _ = trimmed_low_mean(values, frac)
    if floor is not None and not np.isnan(m):
        m = max(m, floor)
    return m


def gamma_log_moment(values: np.ndarray):
    """(alpha, beta) gamma parameters via the log-moment estimator.

    Reference: FILDA_NTL.py:252-267 —
      s = ln(mean(x)) - mean(ln(x))
      alpha = (3 - s + sqrt((s-3)^2 + 24 s)) / (12 s)
      beta  = mean(x) / alpha
    Positive values only; NaN if fewer than 2 positives.
    """
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v) & (v > 0)]
    if v.size < 2:
        return np.nan, np.nan
    mean = float(np.mean(v))
    mean_log = float(np.mean(np.log(v)))
    s = np.log(mean) - mean_log
    if s <= 0:
        return np.nan, np.nan
    alpha = (3.0 - s + np.sqrt((s - 3.0) ** 2 + 24.0 * s)) / (12.0 * s)
    return float(alpha), float(mean / alpha)


def grouped_weighted_median_mad(owner: np.ndarray, values: np.ndarray,
                                counts: np.ndarray, n_owners: int):
    """Vectorized weighted median + MAD per owner group.

    Input rows are (owner_idx, value, count) triplets of a multiset
    {value repeated count times} per owner; duplicate (owner, value)
    rows are fine (counts add).  Returns (median, MAD, n) arrays of
    length ``n_owners``; owners with no rows get (nan, nan, 0).
    Interpolation matches numpy/DuckDB (avg of the two middle elements
    for even totals).

    The trick that removes the per-group Python loop: with rows sorted
    by (owner, value), the GLOBAL cumulative-count array is strictly
    increasing, so one ``np.searchsorted(gcum, seg_base + rank + 1)``
    call resolves the target rank of EVERY owner segment at once.
    """
    med = np.full(n_owners, np.nan)
    mad = np.full(n_owners, np.nan)
    tot = np.zeros(n_owners, dtype=np.int64)
    if len(owner) == 0:
        return med, mad, tot

    def _pass(o, v, c):
        gcum = np.cumsum(c)
        seg_start = np.r_[0, np.flatnonzero(o[1:] != o[:-1]) + 1]
        seg_end = np.r_[seg_start[1:], len(o)]
        base = np.where(seg_start > 0, gcum[seg_start - 1], 0)
        totals = gcum[seg_end - 1] - base
        odd = (totals % 2) == 1
        r1 = np.where(odd, totals // 2, totals // 2 - 1)
        i1 = np.searchsorted(gcum, base + r1 + 1)
        i2 = np.searchsorted(gcum, base + totals // 2 + 1)
        m = np.where(odd, v[i1], 0.5 * (v[i1] + v[i2]))
        return o[seg_start], m, totals

    o = np.asarray(owner, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    c = np.asarray(counts, dtype=np.int64)
    # zero/negative-count rows would make gcum non-strictly increasing
    # and let an empty segment searchsort into the previous owner's
    # values; dropping them preserves the multiset semantics exactly
    # (an owner whose rows all drop gets the empty-owner (nan, nan, 0))
    pos = c > 0
    if not pos.all():
        o, v, c = o[pos], v[pos], c[pos]
        if len(o) == 0:
            return med, mad, tot
    order = np.lexsort((v, o))
    o, v, c = o[order], v[order], c[order]
    po, pm, ptot = _pass(o, v, c)
    med[po] = pm
    tot[po] = ptot
    dev = np.abs(v - med[o])
    order2 = np.lexsort((dev, o))
    po2, pmad, _ = _pass(o[order2], dev[order2], c[order2])
    mad[po2] = pmad
    return med, mad, tot


def hdi_bounds(sorted_mat: np.ndarray, frac: float = 0.95):
    """Per-row shortest window containing ceil(frac*d) sorted values —
    the highest-density-interval summary of a posterior sample row
    (MCBEF.py:856-889 computes the 95%% HDI per fire), vectorized over
    all rows at once.  Ties on width take the FIRST window.  Returns
    (lo, hi) arrays.  ``frac=0.5`` with midpoint (lo+hi)/2 is the
    one-step half-sample mode estimator used for the 'mode' summary.
    """
    n, d = sorted_mat.shape
    m = int(np.ceil(frac * d))
    widths = sorted_mat[:, m - 1:] - sorted_mat[:, : d - m + 1]
    i = np.argmin(widths, axis=1)
    rows = np.arange(n)
    return sorted_mat[rows, i], sorted_mat[rows, i + m - 1]


def grouped_weighted_low_mean(owner: np.ndarray, values: np.ndarray,
                              counts: np.ndarray, n_owners: int,
                              frac: float = 0.25):
    """Per-owner mean of the lowest max(1, floor(n*frac)) elements of
    the weighted multiset — the reference's trimmed lowest-25%%
    background mean (FILDA.py:1362-1368) as a grouped vectorized
    kernel over histogram rows.  Returns (mean, k_used) arrays of
    length ``n_owners``; empty owners get (nan, 0).

    Same global-cumsum trick as ``grouped_weighted_median_mad``: one
    searchsorted resolves the k-th boundary of every owner at once;
    the partial element at the boundary contributes (k - below_count)
    copies.
    """
    mean = np.full(n_owners, np.nan)
    kk = np.zeros(n_owners, dtype=np.int64)
    if len(owner) == 0:
        return mean, kk
    o = np.asarray(owner, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    c = np.asarray(counts, dtype=np.int64)
    pos = c > 0  # same zero-count guard as grouped_weighted_median_mad
    if not pos.all():
        o, v, c = o[pos], v[pos], c[pos]
        if len(o) == 0:
            return mean, kk
    order = np.lexsort((v, o))
    o, v, c = o[order], v[order], c[order]
    gcum = np.cumsum(c)
    gvsum = np.cumsum(v * c)
    seg_start = np.r_[0, np.flatnonzero(o[1:] != o[:-1]) + 1]
    seg_end = np.r_[seg_start[1:], len(o)]
    base = np.where(seg_start > 0, gcum[seg_start - 1], 0)
    vbase = np.where(seg_start > 0, gvsum[seg_start - 1], 0.0)
    totals = gcum[seg_end - 1] - base
    k = np.maximum(1, np.floor(totals * frac).astype(np.int64))
    j = np.searchsorted(gcum, base + k)
    below_cnt = np.where(j > seg_start, gcum[np.maximum(j - 1, 0)] - base, 0)
    below_sum = np.where(j > seg_start, gvsum[np.maximum(j - 1, 0)] - vbase, 0.0)
    s = below_sum + (k - below_cnt) * v[j]
    mean[o[seg_start]] = s / k
    kk[o[seg_start]] = k
    return mean, kk


# ---------------------------------------------------------------------------
# Combinable partials (engine addition for pre-aggregation)
# ---------------------------------------------------------------------------

def moment_partial(values: np.ndarray):
    """(n, sum, sum_sq, min, max, sum_log_pos, n_pos) — one combinable
    partial per batch; merged by summation, finalized to
    mean/std/gamma downstream.  Enables partial aggregation inside
    map_batches before the groupby shuffle."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return np.array([0, 0.0, 0.0, np.inf, -np.inf, 0.0, 0], dtype=np.float64)
    pos = v[v > 0]
    return np.array(
        [v.size, v.sum(), np.square(v).sum(), v.min(), v.max(),
         np.log(pos).sum() if pos.size else 0.0, pos.size],
        dtype=np.float64,
    )


def moment_finalize(partial: np.ndarray):
    """dict of mean/std(ddof=1)/min/max/gamma(alpha,beta) from a merged
    partial vector (see ``moment_partial``)."""
    n, s, ss, mn, mx, slog, npos = partial
    if n < 1:
        return {"n": 0, "mean": np.nan, "std": np.nan, "min": np.nan,
                "max": np.nan, "alpha": np.nan, "beta": np.nan}
    mean = s / n
    var = (ss - n * mean * mean) / (n - 1) if n > 1 else np.nan
    std = np.sqrt(max(var, 0.0)) if n > 1 else np.nan
    alpha = beta = np.nan
    if npos >= 2:
        mean_pos_log = slog / npos
        # log-moment estimator needs mean over the SAME positive subset;
        # approximate with overall mean when all values positive
        if npos == n:
            g = np.log(mean) - mean_pos_log
            if g > 0:
                alpha = (3.0 - g + np.sqrt((g - 3.0) ** 2 + 24.0 * g)) / (12.0 * g)
                beta = mean / alpha
    return {"n": int(n), "mean": mean, "std": std, "min": mn, "max": mx,
            "alpha": alpha, "beta": beta}


def grouped_weighted_quantiles(owner: np.ndarray, values: np.ndarray,
                               counts: np.ndarray, n_owners: int,
                               probs) -> np.ndarray:
    """percentile_cont-style (linear-interpolated) quantiles per owner
    over (owner, value, count) multisets — numpy 'linear' / DuckDB
    ``quantile_cont`` semantics: target rank h = (n-1)*p, interpolate
    between the floor(h)-th and ceil(h)-th elements.  Same global-
    searchsorted trick as ``grouped_weighted_median_mad``; returns an
    (n_owners, len(probs)) array, NaN rows for empty owners."""
    probs = np.asarray(probs, dtype=np.float64)
    out = np.full((n_owners, len(probs)), np.nan)
    o = np.asarray(owner, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    c = np.asarray(counts, dtype=np.int64)
    pos = c > 0
    if not pos.all():
        o, v, c = o[pos], v[pos], c[pos]
    if len(o) == 0:
        return out
    order = np.lexsort((v, o))
    o, v, c = o[order], v[order], c[order]
    gcum = np.cumsum(c)
    seg_start = np.r_[0, np.flatnonzero(o[1:] != o[:-1]) + 1]
    seg_end = np.r_[seg_start[1:], len(o)]
    base = np.where(seg_start > 0, gcum[seg_start - 1], 0)
    totals = gcum[seg_end - 1] - base
    owners = o[seg_start]
    for pi, p in enumerate(probs):
        h = (totals - 1) * p
        k_lo = np.floor(h).astype(np.int64)
        k_hi = np.ceil(h).astype(np.int64)
        i_lo = np.searchsorted(gcum, base + k_lo + 1)
        i_hi = np.searchsorted(gcum, base + k_hi + 1)
        out[owners, pi] = v[i_lo] + (h - k_lo) * (v[i_hi] - v[i_lo])
    return out
