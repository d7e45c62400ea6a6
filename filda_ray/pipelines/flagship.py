"""Flagship detection pipeline (the BASELINE.json headline metric).

pages -> extract text -> quality features -> geocode (broadcast
gazetteer actor) -> tile encode (hex/S2/PC) -> per-tile background
median/MAD (one groupby shuffle) -> per-row contextual anomaly
classification -> PIP joins (admin/biome) -> per-cell counts -> QA
bitfield -> (optionally) partitioned resumable product.

Mirror of the reference detection lifecycle FILDA_main.py:30-175
(SURVEY.md §3.1), re-expressed Ray-Data-first.

Scale notes:
- ``html``/``text`` are dropped as soon as n_chars/text_match are
  computed — the shuffle stages only ever see narrow columns.
- the narrowed stream is materialized once before branching into
  (background stats | detection) so the page read + extraction run a
  single time; the narrow projection is a few % of input bytes and
  spills if needed.  Set ``materialize_narrow=False`` to recompute
  instead (two streaming passes, zero pinning) on very large runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.qa import qa_pack
from ..ops.background import background_stats
from ..ops.detect import contextual_detect
from ..ops.hotspot import count_in_cell
from ..ops.pip import pip_join
from ..ops.tiling import tile_encode
from ..sources.gazetteer import geocode
from ..sources.pages import read_pages

NARROW_COLS = [
    "doc_id", "url", "warc_ts", "lang", "n_chars", "n_tokens", "text_match",
    "host_id", "lat", "lon", "country",
]
VALUE_COL = "n_chars"


def _extract_and_measure(batch: pa.Table) -> pa.Table:
    """html -> extracted text -> n_chars/n_tokens, then DROP the heavy
    columns (html, text, extracted_text) in the same stage.

    Pure pyarrow.compute kernels — no per-row Python in this hot path."""
    import pyarrow.compute as pc

    from ..kernels.textkit import extract_text_arrow

    ext = extract_text_arrow(batch.column("html"))
    n_chars = pc.cast(pc.utf8_length(ext), pa.int64())
    n_tokens = pc.if_else(
        pc.equal(n_chars, 0),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.add(pc.count_substring(ext, " "), 1), pa.int64()),
    )
    out = batch
    if "text" in batch.column_names:
        out = out.append_column("text_match", pc.equal(ext, pc.fill_null(batch.column("text").cast(pa.string()), "")))
    out = out.append_column("n_chars", n_chars).append_column("n_tokens", n_tokens)
    return out.drop_columns([c for c in ("html", "text") if c in out.column_names])


def _final_qa(batch: pa.Table) -> pa.Table:
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    qa = qa_pack(
        {
            "geocoded": ~np.isnan(lat),
            "valid_latitude": ~np.isnan(lat) & (lat >= -60.0) & (lat <= 85.0),
            "admin_joined": batch.column("admin_id").to_numpy(zero_copy_only=False) >= 0,
            "biome_joined": batch.column("biome_id").to_numpy(zero_copy_only=False) >= 0,
            "dup_in_cell": batch.column("n_in_cell").to_numpy(zero_copy_only=False) > 1,
            "text_extracted": batch.column("text_match").to_numpy(zero_copy_only=False),
        }
    )
    qa = qa | batch.column("qa_detect").to_numpy(zero_copy_only=False)
    return batch.append_column("qa_bits", pa.array(qa, pa.uint32()))


def narrow_pages(sf_dir: str, *, geocode_concurrency: int | None = None, replicate: int = 1,
                 pages_dir: str | None = None):
    """pages -> narrow geocoded+tiled stream (shared pipeline prefix).

    ``pages_dir``: read a materialized pages Parquet table (production
    shape) instead of synthesizing inline from documents.parquet.
    """
    if pages_dir is not None:
        from ..sources.pages import read_pages_parquet

        ds = read_pages_parquet(pages_dir)
    else:
        ds = read_pages(sf_dir, replicate=replicate)
    ds = ds.map_batches(_extract_and_measure, batch_format="pyarrow")
    ds = geocode(ds, concurrency=geocode_concurrency)
    ds = tile_encode(ds)
    return ds


def detect_pipeline(sf_dir: str, *, materialize_narrow: bool = True,
                    concurrency: int | None = None, with_metrics: bool = False,
                    replicate: int = 1, pages_dir: str | None = None,
                    config=None):
    """Full flagship pipeline; returns a Dataset of classified pages.

    ``config`` (a ``filda_ray.config.RunConfig``, e.g. parsed from a
    namelist file) overrides the individual kwargs and threads the
    detection thresholds / ring ladder through every stage — the
    reference's namelist-driven run shape (FILDA.py:57-130).
    """
    from ..config import RunConfig

    cfg = config or RunConfig()
    if config is not None:
        materialize_narrow = cfg.materialize_narrow
        concurrency = cfg.concurrency or concurrency
        replicate = cfg.replicate
        pages_dir = cfg.pages_dir or pages_dir
    ds = narrow_pages(sf_dir, geocode_concurrency=concurrency, replicate=replicate,
                      pages_dir=pages_dir)
    mactor = None
    if with_metrics:
        from ..state.metrics import count_stage, get_metrics_actor

        mactor = get_metrics_actor()
        ds = count_stage(ds, "narrow_pages", mactor)
    if materialize_narrow:
        ds = ds.materialize()
    bg = background_stats(ds, cfg.value_col, rings=cfg.rings, trim_frac=cfg.trim_frac,
                          quantize=cfg.quantize)
    det = contextual_detect(ds, bg, cfg.value_col, concurrency=concurrency,
                            min_bg_n=cfg.min_bg_n, z_lo=cfg.z_lo, z_hi=cfg.z_hi)
    det = pip_join(det, concurrency=concurrency)
    # count from the narrow stream so the detect/pip chain runs once
    det = count_in_cell(det, "hex_r7", counts_from=ds)
    det = det.map_batches(_final_qa, batch_format="pyarrow")
    if with_metrics:
        from ..state.metrics import count_stage

        det = count_stage(det, "classified", mactor)
    return det


def detections_only(sf_dir: str, **kw):
    """Rows flagged anomalous (status>0) — the 'fire pixel table'."""
    det = detect_pipeline(sf_dir, **kw)
    return det.map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("status"), 0)),
        batch_format="pyarrow",
    )


# product field metadata (aux_infor_dict analog, FILDA_IO.py:1337-1474)
PRODUCT_FIELD_METADATA = {
    "url": {"long_name": "page url (detection identity)"},
    "lat": {"long_name": "geocoded latitude", "units": "degrees_north"},
    "lon": {"long_name": "geocoded longitude", "units": "degrees_east"},
    "pc_tile": {"long_name": "Plate-Carree 10-degree tile id"},
    "hex_r7": {"long_name": "hex cell id (H3-style, res 7 equivalent)"},
    "s2_l12": {"long_name": "S2 quadtree cell id, level 12"},
    "hex_prefix": {"long_name": "coarse hex partition prefix"},
    "bg_median": {"long_name": "neighborhood background median of n_chars"},
    "bg_mad": {"long_name": "neighborhood background MAD (unscaled)"},
    "win_ring": {"long_name": "adaptive window ring used (1 or 2)"},
    "score": {"long_name": "robust z anomaly score",
              "legend": "z = (v - median) / (1.4826*MAD + 1e-9)"},
    "status": {"long_name": "detection status", "legend": "0 none, 1 low, 2 high"},
    "qa_bits": {"long_name": "algorithm QA bitfield",
                "legend": "see filda_ray.kernels.qa.QA_BITS"},
    "n_in_cell": {"long_name": "pages sharing the fine hex cell"},
}


def write_detections(sf_dir: str, out_dir: str, *, config=None, **kw):
    """Flagship + resumable partitioned product (partition = pc_tile,
    or ``config.partition_col``).  The parsed run config is recorded in
    every partition's lineage so a product is reproducible from its
    own manifest."""
    from ..state.manifest import resume_filter, write_product

    det = detect_pipeline(sf_dir, config=config, **kw)
    partition_col = config.partition_col if config is not None else "pc_tile"
    lineage = {"input": f"{sf_dir}/documents.parquet", "pipeline": "detect_pipeline"}
    if config is not None:
        lineage["config"] = config.to_lineage()
    det, done = resume_filter(det, out_dir, partition_col)
    return write_product(
        det,
        out_dir,
        partition_col=partition_col,
        lineage=lineage,
        sort_cols=["doc_id"],
        field_metadata=PRODUCT_FIELD_METADATA,
    )
