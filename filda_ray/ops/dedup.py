"""Deduplication operators (engine additions for training-data
pipelines; reference analog for the exact path: np.unique coordinate
dedup, FILDA.py:395-398, 491-497, first-wins :1906-1912).

- ``dedup_exact``: content-hash -> hash-partitioned groupby -> first
  by a deterministic tie-break key.  md5 keys so the operator is
  SQL-oracle-checkable (DuckDB md5()).
- ``minhash_lsh_pairs``: shingle -> MinHash -> banded LSH ->
  groupby(band, band_hash) -> candidate pairs -> exact-Jaccard verify.
  The all-to-all shuffle moves only (band_hash, doc_id, signature)
  rows, never documents.
- ``simhash_pairs``: 64-bit SimHash, candidates via 4x16-bit band
  buckets, verified by Hamming distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import textkit
from ..kernels.hashing import md5_hex
from . import autoscale


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_md5"):
    def f(batch: pa.Table) -> pa.Table:
        h = md5_hex(batch.column(text_col).to_pylist())
        return batch.append_column(out_col, pa.array(h, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content (deterministic winner).

    Shuffle key = content hash (uniform by construction — no salting
    needed); group bodies are tiny (duplicate sets).
    """
    hashed = add_content_hash(ds, text_col)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_md5").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

NUM_PERM = 128
NUM_BANDS = 32  # rows per band = 4 -> catches J >~ 0.5 reliably


class MinHashStage:
    """Actor: permutation params generated once per actor (same seed
    everywhere -> identical signatures)."""

    def __init__(self, num_perm: int = NUM_PERM, shingle_w: int = 3, seed: int = 1):
        self.a, self.b = textkit.minhash_params(num_perm, seed)
        self.w = shingle_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy()
        sigs = np.stack(
            [
                textkit.minhash_signature(textkit.shingle_hashes(t or "", self.w), self.a, self.b)
                for t in texts
            ]
        )
        bands = np.stack([textkit.minhash_bands(s, NUM_BANDS) for s in sigs])
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, NUM_BANDS)),
                "band": pa.array(np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)),
                "band_hash": pa.array(bands.ravel(), pa.uint64()),
            }
        )


def minhash_lsh_pairs(ds, *, concurrency: int = 4, shingle_w: int = 3):
    """Dataset op: documents -> candidate near-dup pairs (a < b).

    Returns a Dataset of (doc_a, doc_b) candidate pairs from shared
    LSH buckets (deduplicated).  Verification (exact Jaccard) is a
    separate op so callers can batch it against the document store.
    """
    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"shingle_w": shingle_w},
        batch_format="pyarrow",
        concurrency=autoscale(concurrency),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if ids.size < 2 or ids.size > 1000:  # runaway-bucket guard (log + drop)
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = banded.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(dedup_pairs, batch_format="pandas")


def verify_jaccard(pairs_df: pd.DataFrame, texts_by_id: dict, *, shingle_w: int = 3,
                   threshold: float = 0.7) -> pd.DataFrame:
    """Driver-side exact-Jaccard verification of a (small) candidate set."""
    out = []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        j = textkit.jaccard(
            textkit.shingle_hashes(texts_by_id.get(int(a), ""), shingle_w),
            textkit.shingle_hashes(texts_by_id.get(int(b), ""), shingle_w),
        )
        out.append((int(a), int(b), j))
    df = pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
    return df[df["jaccard"] >= threshold].reset_index(drop=True)


def simhash_pairs(ds, *, max_hamming: int = 6):
    """SimHash near-dup: 4 x 16-bit band buckets -> candidate pairs ->
    Hamming verify (all inside the group; signatures travel, not docs)."""
    from .text import fingerprint_op

    sigs = fingerprint_op(ds.select_columns(["doc_id", "text"])).select_columns(
        ["doc_id", "simhash"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sh = batch.column("simhash").to_numpy()
        bands = np.stack(
            [((sh >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.uint64) for k in range(4)],
            axis=1,
        )
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(sh, 4), pa.uint64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_hash": pa.array(bands.ravel(), pa.uint64()),
            }
        )

    banded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2 or ids.size > 1000:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(np.int64)
        a, b = np.triu_indices(ids.size, k=1)
        hd = textkit.hamming64(sh[a], sh[b])
        keep = hd <= max_hamming
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep], "hamming": hd[keep]})

    cand = banded.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(dd, batch_format="pandas")
