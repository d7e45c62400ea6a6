"""Text-processing stages over the pages table.

Reference analog: the per-granule derive/projection stages (get_bt
M3, QA decode M22) — stateless vectorized map_batches.  Engine
additions per the training-data-pipeline requirement: extraction,
token counting, quality scoring, language ID, fingerprints.
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
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


def vocab_count(ds, text_col: str = "text", *, top_k: int | None = None):
    """Corpus vocabulary counts (training-data op): per-batch token
    count partials (one row per distinct token per batch — the
    pre-aggregate-before-shuffle pattern) -> merge -> optional top-k.

    Tokenization = single-space split (SQL mirror: unnest(string_split)).
    Returns Dataset(token, n) sorted by (-n, token) when top_k is set.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        counts: dict[str, int] = {}
        for t in texts:
            if not t:
                continue
            for w in t.split(" "):
                counts[w] = counts.get(w, 0) + 1
        if not counts:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"token": pa.array(list(counts.keys()), pa.string()),
                         "n": pa.array(np.fromiter(counts.values(), dtype=np.int64,
                                                   count=len(counts)))})

    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=HIST_BATCH_ROWS).groupby("token", num_partitions=shuffle_partitions()).aggregate(
        Sum("n", alias_name="n")
    )

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"token": b.column("token"),
                         "n": b.column("n").cast(pa.int64())})

    merged = merged.map_batches(clean, batch_format="pyarrow")
    if top_k is None:
        return merged
    # streaming top-k: block-local partial top-k by the exact final
    # criterion (n desc, token asc), so the driver merges <= k rows
    # per block instead of the whole vocabulary
    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n", "token"], ascending=[False, True],
                                       kind="mergesort").head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    df = merged.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(top_k)
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False))


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
