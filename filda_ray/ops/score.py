"""Stateful per-row model scoring (actor pool).

Reference analog: MCBEF's biphasic/uniphasic estimators (SURVEY.md
T8): three PyMC models compiled ONCE per process, per-row inversion
with a routing + degradation fallback chain and QA flag algebra
(MCBEF.py:589-702).  The engine keeps the execution shape — expensive
state in ``__init__``, per-batch vectorized scoring, fallback chain,
QA bits — with a deterministic closed-form model instead of MCMC
(sandbox has no PyMC; semantics of routing/fallback/QA preserved):

model: observed (n_chars, n_tokens) of a page are explained as a
two-component mixture of a 'template' token-length profile and a
'content' profile; estimate the mixture fraction p and scale t by a
precomputed grid search (the 'compiled model' state) refined by one
vectorized parabolic step.

QA flags (MCBEF.py:95-107 analog):
  0 ok-biphasic, 1 ok-uniphasic, 2 fallback-degraded, 3 invalid-input
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BIPHASIC_MIN_TOKENS = 20  # routing threshold (MCBEF FRP-threshold analog)
TEMPLATE_LEN = 4.0  # 'template' component token length of the mixture model


class Estimator:
    def __init__(self, grid_n: int = 64, emit_trace: bool = False, n_samples: int = 32):
        # 'compile' the model: parameter grid + model curves, once per actor
        self.p_grid = np.linspace(0.05, 0.95, grid_n)          # mixture fraction
        self.t_grid = np.linspace(2.0, 12.0, grid_n)           # mean token length scale
        P, T = np.meshgrid(self.p_grid, self.t_grid, indexing="ij")
        # model: mean_token_len = p * t + (1-p) * TEMPLATE_LEN
        self.TEMPLATE_LEN = TEMPLATE_LEN
        self.model_mtl = P * T + (1.0 - P) * self.TEMPLATE_LEN  # (grid_n, grid_n)
        self.P = P
        self.T = T
        self.emit_trace = emit_trace
        self.n_samples = n_samples

    def _fit(self, mtl: np.ndarray, n_trace: int = 0):
        """Vectorized grid argmin of (model - observed)^2 per row; with
        ``n_trace`` also the t values of the n_trace best grid points
        per row (the deterministic pseudo-posterior sample — the
        likelihood-ranked analog of MCBEF's MCMC draws).

        Trace selection is DETERMINISTIC by (err, flat index) — a
        stable argsort, not argpartition, whose boundary tie choice is
        implementation-defined — so traces are reproducible and
        SQL-oracle-comparable."""
        err = (self.model_mtl[None, :, :] - mtl[:, None, None]) ** 2
        flat = err.reshape(err.shape[0], -1)
        idx = np.argmin(flat, axis=1)
        pi, ti = np.unravel_index(idx, self.model_mtl.shape)
        trace = None
        if n_trace:
            best = np.argsort(flat, axis=1, kind="stable")[:, :n_trace]
            trace = np.sort(self.T.ravel()[best], axis=1)
        return self.p_grid[pi], self.t_grid[ti], flat[np.arange(len(idx)), idx], trace

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        n_tokens = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        valid = (n_tokens > 0) & (n_chars > 0)
        mtl = np.where(valid, (n_chars - np.maximum(n_tokens - 1, 0)) / np.maximum(n_tokens, 1), np.nan)

        p_hat = np.full(len(mtl), np.nan)
        t_hat = np.full(len(mtl), np.nan)
        qa = np.full(len(mtl), 3, dtype=np.int32)  # invalid by default

        bip = valid & (n_tokens >= BIPHASIC_MIN_TOKENS)
        uni = valid & ~bip
        trace_bip = None
        if bip.any():
            p, t, resid, trace_bip = self._fit(
                mtl[bip], self.n_samples if self.emit_trace else 0)
            good = resid < 4.0
            # degradation fallback: poor biphasic fit -> uniphasic estimate
            p = np.where(good, p, 1.0)
            t = np.where(good, t, mtl[bip])
            p_hat[bip] = p
            t_hat[bip] = t
            qa[bip] = np.where(good, 0, 2)
        if uni.any():
            # uniphasic: single component, closed form
            p_hat[uni] = 1.0
            t_hat[uni] = mtl[uni]
            qa[uni] = 1
        out = (
            batch.append_column("est_p", pa.array(p_hat))
            .append_column("est_t", pa.array(t_hat))
            .append_column("est_qa", pa.array(qa))
        )
        if self.emit_trace:
            # trace: grid pseudo-posterior for good biphasic fits, a
            # constant (point) trace otherwise (uniphasic / fallback);
            # invalid rows carry NaN traces
            trace = np.repeat(t_hat[:, None], self.n_samples, axis=1)
            if trace_bip is not None:
                bidx = np.flatnonzero(bip)
                good_rows = bidx[qa[bip] == 0]
                trace[good_rows] = trace_bip[qa[bip] == 0]
            out = out.append_column(
                "trace_t",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(trace.ravel(), pa.float64()), self.n_samples),
            )
        return out


def score_op(ds, *, concurrency=(2, 8), batch_size: int = 2048,
             emit_trace: bool = False, n_samples: int = 32):
    """Dataset op: quality-featured rows -> + (est_p, est_t, est_qa[,
    trace_t]).

    Autoscaling actor pool; batch_size kept moderate because the grid
    search is O(batch x grid^2) memory.  ``emit_trace`` adds a
    fixed-size posterior-sample column for ``summarize_posteriors``.
    """
    return ds.map_batches(
        Estimator,
        fn_constructor_kwargs={"emit_trace": emit_trace, "n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RESID_WARN = 2.0  # |obs - model| above this flags eval-warn


def evaluate_op(scored, *, resid_warn: float = RESID_WARN):
    """Forward-model re-evaluation stage (MCBEF_EVAL analog,
    /root/reference/src/MCBEF/MCBEF_EVAL.py:85-134: re-run the fitted
    forward model against the observations and compare modeled vs
    observed signal; the reference plots, the engine emits product QA
    columns).

    Per-row, one vectorized map_batches, no shuffle:
    - ``model_mtl``: the fitted forward model p*t + (1-p)*TEMPLATE_LEN
      evaluated at (est_p, est_t) — the 'modeled signal';
    - ``eval_resid``: observed mean-token-length minus model;
    - ``eval_qa``: 0 good (|resid| <= resid_warn), 1 warn, 2 invalid
      (estimator QA = invalid, or non-finite inputs).
    """

    def f(batch: pa.Table) -> pa.Table:
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        n_tokens = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch.column("est_p").to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch.column("est_t").to_numpy(zero_copy_only=False).astype(np.float64)
        qa = batch.column("est_qa").to_numpy(zero_copy_only=False)
        valid = (n_tokens > 0) & (n_chars > 0)
        mtl_obs = np.where(
            valid, (n_chars - np.maximum(n_tokens - 1, 0)) / np.maximum(n_tokens, 1),
            np.nan)
        model = p * t + (1.0 - p) * TEMPLATE_LEN
        resid = mtl_obs - model
        bad = (qa == 3) | ~np.isfinite(resid)
        eval_qa = np.where(bad, 2, np.where(np.abs(resid) <= resid_warn, 0, 1))
        return (
            batch.append_column("model_mtl", pa.array(np.where(bad, np.nan, model)))
            .append_column("eval_resid", pa.array(np.where(bad, np.nan, resid)))
            .append_column("eval_qa", pa.array(eval_qa.astype(np.int32)))
        )

    return scored.map_batches(f, batch_format="pyarrow")


def summarize_posteriors(scored, trace_col: str = "trace_t"):
    """Per-row posterior summarization (MCBEF post_processing analog,
    MCBEF.py:827-913: traces -> 95% HDI + mode per fire): the trace
    column lives WITH the row, so no shuffle — one vectorized
    map_batches computing HDI bounds and the half-sample mode."""

    def f(batch: pa.Table) -> pa.Table:
        from ..kernels.stats import hdi_bounds
        from .embed import _to_matrix

        mat = _to_matrix(batch.column(trace_col), np.float64)
        s = np.sort(mat, axis=1)
        lo, hi = hdi_bounds(s, 0.95)
        mlo, mhi = hdi_bounds(s, 0.5)
        return (
            batch.drop_columns([trace_col])
            .append_column("est_t_hdi_lo", pa.array(lo))
            .append_column("est_t_hdi_hi", pa.array(hi))
            .append_column("est_t_mode", pa.array((mlo + mhi) / 2.0))
        )

    return scored.map_batches(f, batch_format="pyarrow")
