"""Per-row contextual anomaly classification.

Reference analog: identify_one's 3-test flag over adaptive-window
median/MAD background (FILDA.py:875-998) and the two-tier significance
levels (FILDA.py:962-969).  Engine form:

- the (small) per-tile background table is broadcast once via
  ``ray.put`` and gathered per batch by integer index — the
  reference's compute-index-then-lookup join shape (SURVEY.md §2.4);
  with a 10-degree grid the table is <= 648 rows, so a shuffle join
  would be waste.  (For fine grids where the bg table is large, use
  ``relational.hash_join`` on the tile key instead.)
- adaptive window: ring-1 stats when populated (bg1_n >= min_bg_n),
  else ring-2 (win_ring column records the escalation; QA bits
  bg_ring1/bg_ring2/bg_low_n).
- two-tier significance: status 2 (hi) / 1 (lo) / 0 on the robust z.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.qa import qa_pack
from ..kernels.stats import MAD_SCALE
from . import autoscale

Z_LO = 3.0
Z_HI = 6.0
MIN_BG_N = 10  # reference min valid = min(10, 0.25*win^2), FILDA.py:833-841
EPS = 1e-9


class BgJoinDetect:
    """Actor stage: gather broadcast bg stats by tile id + classify.

    The ring ladder is discovered from the bg table's bg{k}_* columns
    (configurable per ``background_stats(rings=...)``): the smallest
    ring with n >= min_bg_n wins, else the largest — the adaptive
    window escalation generalized from the fixed ring-1/ring-2 pair
    (reference grows half-win 5->31 step 1, FILDA.py:804-845)."""

    def __init__(self, bg_ref, value_col: str, min_bg_n: int = MIN_BG_N,
                 z_lo: float = Z_LO, z_hi: float = Z_HI):
        import re

        import ray

        bg: pa.Table = ray.get(bg_ref) if not isinstance(bg_ref, pa.Table) else bg_ref
        tiles = bg.column("pc_tile").to_numpy()
        size = int(tiles.max()) + 1 if len(tiles) else 1
        self.size = size
        self.min_bg_n = min_bg_n
        self.z_lo = z_lo
        self.z_hi = z_hi
        self.value_col = value_col
        self.rings = sorted(
            int(m.group(1)) for c in bg.column_names
            if (m := re.fullmatch(r"bg(\d+)_median", c))
        )
        self.has_trim = all(f"bg{k}_trim" in bg.column_names for k in self.rings)
        # dense index arrays: O(#tiles) memory, O(1) per-row gather
        self.m, self.d, self.n, self.t = {}, {}, {}, {}
        for k in self.rings:
            self.m[k] = np.full(size, np.nan)
            self.d[k] = np.full(size, np.nan)
            self.n[k] = np.zeros(size, dtype=np.int64)
            self.m[k][tiles] = bg.column(f"bg{k}_median").to_numpy()
            self.d[k][tiles] = bg.column(f"bg{k}_mad").to_numpy()
            self.n[k][tiles] = bg.column(f"bg{k}_n").to_numpy()
            if self.has_trim:
                self.t[k] = np.full(size, np.nan)
                self.t[k][tiles] = bg.column(f"bg{k}_trim").to_numpy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.column("pc_tile").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(self.value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = (t >= 0) & (t < self.size)
        ti = np.where(ok, t, 0)
        last = self.rings[-1]
        med = self.m[last][ti].copy()
        mad = self.d[last][ti].copy()
        n = self.n[last][ti].copy()
        trim = self.t[last][ti].copy() if self.has_trim else None
        win_ring = np.full(len(t), last, dtype=np.int32)
        for k in reversed(self.rings[:-1]):
            use = self.n[k][ti] >= self.min_bg_n
            med = np.where(use, self.m[k][ti], med)
            mad = np.where(use, self.d[k][ti], mad)
            n = np.where(use, self.n[k][ti], n)
            if trim is not None:
                trim = np.where(use, self.t[k][ti], trim)
            win_ring = np.where(use, k, win_ring).astype(np.int32)
        # rows with out-of-range tile ids (e.g. ungeocoded pages) must
        # not be classified against tile 0's background: force the
        # low_n path (n=0 -> status 0) and null the background stats,
        # mirroring the bg-build side's exclusion of t < 0
        med = np.where(ok, med, np.nan)
        mad = np.where(ok, mad, np.nan)
        n = np.where(ok, n, 0)
        low_n = n < self.min_bg_n
        z = (v - med) / (MAD_SCALE * mad + EPS)
        status = np.where(low_n, 0, np.where(z >= self.z_hi, 2, np.where(z >= self.z_lo, 1, 0)))
        first = self.rings[0]
        qa = qa_pack(
            {
                "bg_ring1": (win_ring == first) & ~low_n,
                "bg_ring2": (win_ring != first) & ~low_n,
                "bg_low_n": low_n,
                "anom_lo": status >= 1,
                "anom_hi": status == 2,
            }
        )
        out = (
            batch.append_column("bg_median", pa.array(med))
            .append_column("bg_mad", pa.array(mad))
            .append_column("bg_n", pa.array(n.astype(np.int64)))
            .append_column("win_ring", pa.array(win_ring))
            .append_column("score", pa.array(z))
            .append_column("status", pa.array(status.astype(np.int32)))
            .append_column("qa_detect", pa.array(qa, pa.uint32()))
        )
        if trim is not None:
            out = out.append_column("bg_trim", pa.array(np.where(ok, trim, np.nan)))
        return out


def _classify(v: np.ndarray, med: np.ndarray, mad: np.ndarray, n: np.ndarray,
              win_ring: np.ndarray, min_bg_n: int, z_lo: float, z_hi: float):
    """Shared two-tier robust-z classification + QA bits."""
    low_n = n < min_bg_n
    z = (v - med) / (MAD_SCALE * mad + EPS)
    status = np.where(low_n, 0, np.where(z >= z_hi, 2, np.where(z >= z_lo, 1, 0)))
    qa = qa_pack(
        {
            "bg_ring1": (win_ring == 1) & ~low_n,
            "bg_ring2": (win_ring != 1) & ~low_n,
            "bg_low_n": low_n,
            "anom_lo": status >= 1,
            "anom_hi": status == 2,
        }
    )
    return z, status.astype(np.int32), qa


BROADCAST_MAX_BG_CELLS = 2_000_000


def contextual_detect_hex(ds, bg_ds, value_col: str, *, cell_col: str = "hex_r7",
                          min_bg_n: int = MIN_BG_N, z_lo: float = Z_LO,
                          z_hi: float = Z_HI, mode: str = "auto",
                          broadcast_max_cells: int = BROADCAST_MAX_BG_CELLS):
    """Per-row anomaly classification against the FINE hex-grid
    background (the north_star's per-pixel contextual kernel: each page
    scored against the k-ring neighborhood stats of its own hex cell,
    from ``background_stats_hex``).

    ``mode`` is chosen by MEASURED occupied-cell cardinality when
    'auto': ``broadcast`` (the occupied-cell bg table is ray.put once
    and gathered per batch by sorted-key searchsorted) up to
    ``broadcast_max_cells`` — one 56-byte row per occupied cell;
    ``join`` (hash join on the cell id, the bg table never leaves the
    cluster) for planetary cell counts where the broadcast would be
    GBs.  Same results either way (tested equal).
    """
    import ray

    from .workercache import worker_state

    if mode == "auto":
        if isinstance(bg_ds, pa.Table):
            mode = "broadcast" if len(bg_ds) <= broadcast_max_cells else "join"
        else:
            bg_ds = bg_ds.materialize()
            mode = "broadcast" if bg_ds.count() <= broadcast_max_cells else "join"

    if mode == "join":
        import ray.data as rd

        from . import derive_buckets
        from .relational import hash_join

        bg_side = rd.from_arrow(bg_ds) if isinstance(bg_ds, pa.Table) else bg_ds
        joined = hash_join(ds, bg_side, on=cell_col, right_on="cell",
                           how="left_outer", num_partitions=derive_buckets(ds))

        def classify_joined(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            n1 = pc.fill_null(batch.column("bg1_n"), 0).to_numpy().astype(np.int64)
            use1 = n1 >= min_bg_n
            med = np.where(use1,
                           pc.fill_null(batch.column("bg1_median"), np.nan).to_numpy(),
                           pc.fill_null(batch.column("bg2_median"), np.nan).to_numpy())
            mad = np.where(use1,
                           pc.fill_null(batch.column("bg1_mad"), np.nan).to_numpy(),
                           pc.fill_null(batch.column("bg2_mad"), np.nan).to_numpy())
            n = np.where(use1, n1,
                         pc.fill_null(batch.column("bg2_n"), 0).to_numpy().astype(np.int64))
            ring = np.where(use1, 1, 2).astype(np.int32)
            z, status, qa = _classify(v, med, mad, n, ring, min_bg_n, z_lo, z_hi)
            out = batch.drop_columns([c for c in batch.column_names
                                      if c.startswith("bg1_") or c.startswith("bg2_")
                                      or c == "cell"])
            return (
                out.append_column("bg_median", pa.array(med))
                .append_column("bg_mad", pa.array(mad))
                .append_column("bg_n", pa.array(n.astype(np.int64)))
                .append_column("win_ring", pa.array(ring))
                .append_column("score", pa.array(z))
                .append_column("status", pa.array(status))
                .append_column("qa_detect", pa.array(qa, pa.uint32()))
            )

        return joined.map_batches(classify_joined, batch_format="pyarrow")

    bg_tbl = pa.concat_tables(
        [b for b in bg_ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    ) if not isinstance(bg_ds, pa.Table) else bg_ds
    cells_arr = bg_tbl.column("cell").to_numpy().astype(np.uint64)
    order = np.argsort(cells_arr)
    packed = (
        cells_arr[order],
        bg_tbl.column("bg1_median").to_numpy()[order],
        bg_tbl.column("bg1_mad").to_numpy()[order],
        bg_tbl.column("bg1_n").to_numpy().astype(np.int64)[order],
        bg_tbl.column("bg2_median").to_numpy()[order],
        bg_tbl.column("bg2_mad").to_numpy()[order],
        bg_tbl.column("bg2_n").to_numpy().astype(np.int64)[order],
    )
    ref = ray.put(packed)

    def classify(batch: pa.Table) -> pa.Table:
        keys, m1, d1, n1, m2, d2, n2 = worker_state(ref, lambda: ray.get(ref))
        c = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(keys, c)
        idx = np.clip(idx, 0, max(len(keys) - 1, 0))
        hit = (len(keys) > 0) & (keys[idx] == c)
        use1 = hit & (n1[idx] >= min_bg_n)
        med = np.where(hit, np.where(use1, m1[idx], m2[idx]), np.nan)
        mad = np.where(hit, np.where(use1, d1[idx], d2[idx]), np.nan)
        n = np.where(hit, np.where(use1, n1[idx], n2[idx]), 0)
        ring = np.where(use1, 1, 2).astype(np.int32)
        z, status, qa = _classify(v, med, mad, n, ring, min_bg_n, z_lo, z_hi)
        return (
            batch.append_column("bg_median", pa.array(med))
            .append_column("bg_mad", pa.array(mad))
            .append_column("bg_n", pa.array(n.astype(np.int64)))
            .append_column("win_ring", pa.array(ring))
            .append_column("score", pa.array(z))
            .append_column("status", pa.array(status))
            .append_column("qa_detect", pa.array(qa, pa.uint32()))
        )

    return ds.map_batches(classify, batch_format="pyarrow")


def contextual_detect(ds, bg_ds, value_col: str, *, concurrency: int | None = None,
                      min_bg_n: int = MIN_BG_N, z_lo: float = Z_LO, z_hi: float = Z_HI):
    """Dataset op: rows + bg table -> rows with score/status/QA.

    ``bg_ds`` is materialized (it is tiny: one row per populated tile)
    and broadcast; the page stream itself keeps streaming.  Default
    execution is stateless tasks with the bg gather state cached per
    worker process; pass ``concurrency`` for an explicit actor pool.
    """
    import ray

    from .workercache import worker_state

    bg_tbl = pa.concat_tables(
        [b for b in bg_ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    ) if not isinstance(bg_ds, pa.Table) else bg_ds
    bg_ref = ray.put(bg_tbl)
    if concurrency is not None:
        return ds.map_batches(
            BgJoinDetect,
            fn_constructor_args=(bg_ref, value_col, min_bg_n, z_lo, z_hi),
            batch_format="pyarrow",
            concurrency=autoscale(concurrency),
        )

    def fn(batch: pa.Table) -> pa.Table:
        st = worker_state(bg_ref, lambda: BgJoinDetect(bg_ref, value_col, min_bg_n, z_lo, z_hi))
        return st(batch)

    return ds.map_batches(fn, batch_format="pyarrow")
