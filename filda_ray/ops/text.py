"""Text-processing stages over the pages table.

Reference analog: the per-granule derive/projection stages (get_bt
M3, QA decode M22) — stateless vectorized map_batches.  Engine
additions per the training-data-pipeline requirement: extraction,
token counting, quality scoring, language ID, fingerprints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import textkit


def extract_stage(batch: pa.Table) -> pa.Table:
    """html -> extracted_text (+ match flag vs the shipped text column
    when present; byte-identical is the per-row invariant).

    Uses the vectorized Arrow extractor; ``textkit.extract_text`` is
    the scalar reference implementation the tests pin it against."""
    import pyarrow.compute as pc

    ext = textkit.extract_text_arrow(batch.column("html"))
    out = batch.append_column("extracted_text", ext)
    if "text" in batch.column_names:
        match = pc.equal(ext, pc.fill_null(batch.column("text").cast(pa.string()), ""))
        out = out.append_column("text_match", match)
    return out


def extract_text_op(ds):
    return ds.map_batches(extract_stage, batch_format="pyarrow")


def quality_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    feats = textkit.quality_features(texts)
    out = batch
    for name, arr in feats.items():
        out = out.append_column(name, pa.array(arr))
    return out


def quality_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: quality_stage(b, text_col), batch_format="pyarrow")


def langid_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    guess = textkit.lang_id(batch.column(text_col).to_pylist())
    return batch.append_column("lang_guess", pa.array(guess, pa.string()))


def langid_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: langid_stage(b, text_col), batch_format="pyarrow")


def fingerprint_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fp = textkit.fingerprint64(texts)
    sh = textkit.simhash64(texts)
    return (
        batch.append_column("fingerprint", pa.array(fp, pa.uint64()))
        .append_column("simhash", pa.array(sh, pa.uint64()))
    )


def fingerprint_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: fingerprint_stage(b, text_col), batch_format="pyarrow")
