"""Estimation pipeline — the MCBEF lifecycle analog (SURVEY.md §3.2).

Reference flow (MCBEF/main.py:10-101): read the detection product
back (fan-in reader), enrich with static-layer lookups (surface
emissivity with climatology fallback, MCBEF_IO.py:168-324), run the
per-row stateful estimator with routing + fallback QA
(MCBEF.py:589-702), summarize posteriors, write per-group outputs.

Engine form:
1. ``read_product`` of a detection run (resumable partitioned parquet)
   — or the flagship pipeline inline when no product dir is given;
2. enrichment: broadcast side-table lookup with coalesce fallback
   (NRT-falls-back-to-climatology semantics via two lookup layers);
3. ``score_op`` actor pool (compiled-state estimator, fallback chain);
4. per-bucket summarization (A9 grouped output split analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ops import shuffle_partitions

from ..ops.relational import broadcast_join
from ..ops.score import score_op
from ..sources import pages as P


def _emissivity_layers() -> tuple[pa.Table, pa.Table]:
    """Deterministic 'NRT' (sparse) and 'climatology' (dense) side
    tables keyed by host_id — the VNP21A2 NRT/CLT pair analog."""
    host = np.arange(P.N_HOSTS, dtype=np.int64)
    clim = 0.8 + 0.2 * ((host * 131 + 7) % 97) / 97.0
    clt = pa.table({"host_id": pa.array(host), "emis_clt": pa.array(clim)})
    nrt_host = host[host % 3 == 0]  # NRT coverage is partial by design
    nrt = pa.table(
        {
            "host_id": pa.array(nrt_host),
            "emis_nrt": pa.array(0.75 + 0.25 * ((nrt_host * 17 + 3) % 89) / 89.0),
        }
    )
    return nrt, clt


def enrich(ds):
    """Broadcast lookups with coalesce fallback (MCBEF_IO.py:193-199:
    use NRT when present, else climatology)."""
    nrt, clt = _emissivity_layers()
    ds = broadcast_join(ds, nrt, on="host_id")
    ds = broadcast_join(ds, clt, on="host_id")

    def coalesce(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        emis = pc.coalesce(batch.column("emis_nrt"), batch.column("emis_clt"))
        used_nrt = pc.is_valid(batch.column("emis_nrt"))
        return (
            batch.append_column("emissivity", emis)
            .append_column("emis_from_nrt", used_nrt)
            .drop_columns(["emis_nrt", "emis_clt"])
        )

    return ds.map_batches(coalesce, batch_format="pyarrow")


def summarize(scored, by: str = "pc_tile") -> "pd.DataFrame":
    """Per-group estimate summary (A9 per-overpass split analog):
    counts by estimator QA class + mean estimate."""
    from ray.data.aggregate import Count, Mean

    return (
        scored.groupby([by, "est_qa"], num_partitions=shuffle_partitions())
        .aggregate(Count(alias_name="n"), Mean("est_p", alias_name="mean_p"),
                   Mean("est_t", alias_name="mean_t"))
    )


def estimate_pipeline(sf_dir: str | None = None, product_dir: str | None = None,
                      **kw):
    """Detections -> enriched -> scored rows (the MCBEF main analog).

    Reads a written detection product when ``product_dir`` is given
    (the reprocessing/resume path, S17 analog); otherwise runs the
    flagship inline.
    """
    if product_dir is not None:
        from ..state.manifest import read_product

        det = read_product(product_dir)
    else:
        from .flagship import detect_pipeline

        det = detect_pipeline(sf_dir, **kw)
    det = enrich(det)
    return score_op(det)
