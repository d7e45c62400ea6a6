"""Byte-level BPE tokenizer — train on a deterministic sample, encode
distributed (the training-data "token counting" op with a REAL learned
vocabulary instead of a whitespace heuristic).

Scale shape mirrors ``embed.kmeans_distributed``: training reads a
hash-random sample (canonical order) and runs driver-side — BPE merge
selection is inherently sequential and the sample is small — while the
ENCODE pass is the distributed part: an actor pool holds the compiled
merge table once per worker and maps the corpus.  At 100 TB you swap
the per-doc Python merge loop for a C tokenizer behind the same stage
signature; the Ray-side plumbing (broadcast vocab, actor pool, output
layout) is the part this engine owns.

Public-knowledge algorithm (Sennrich et al. 2016, byte-level per
GPT-2's public description); no external tokenizer code.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import autoscale, pool_size


def _pair_counts(seqs):
    c = {}
    for s in seqs:
        for a, b in zip(s, s[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    return c


def bpe_train(texts, n_merges: int = 200):
    """Greedy byte-level BPE on an in-memory sample.  Returns the
    ordered merge list [((a, b), new_id), ...]; ids 0-255 are raw
    bytes, merged symbols get 256, 257, ...  Deterministic tie-break:
    highest count, then smallest (a, b)."""
    seqs = [list(t.encode("utf-8")) for t in texts if t]
    merges = []
    next_id = 256
    for _ in range(n_merges):
        counts = _pair_counts(seqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append((best, next_id))
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
        next_id += 1
    return merges


def bpe_encode_bytes(data: bytes, ranks: dict) -> list:
    """Encode one byte string: repeatedly merge ALL occurrences of the
    lowest-rank adjacent pair present (the standard BPE apply order;
    ``ranks`` maps pair -> (rank, new_id))."""
    s = list(data)
    while len(s) > 1:
        best = None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best is None or r[0] < best[0][0]):
                best = (r, (s[i], s[i + 1]))
        if best is None:
            break
        (rank, new_id), (a, b) = best
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(new_id)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_decode(ids, merges) -> bytes:
    """Inverse of encode: expand merged symbols back to bytes."""
    table = {nid: pair for pair, nid in merges}
    out = []
    stack = list(reversed(list(ids)))
    while stack:
        t = stack.pop()
        if t < 256:
            out.append(t)
        else:
            a, b = table[int(t)]
            stack.append(b)
            stack.append(a)
    return bytes(out)


def train_bpe_on_corpus(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        n_merges: int = 200, sample_size: int = 500,
                        seed: int = 0):
    """Deterministic hash-random sample (canonical (hash, id) order —
    the run-order-independent gather) -> driver-side BPE train."""
    from .embed import sample_matrix  # noqa: F401  (pattern reference)
    from .sample import hash_sample, hash_uniform

    n_rows = max(ds.count(), 1)
    frac = min(1.0, (2.0 * sample_size) / n_rows)
    samp = pa.concat_tables(
        list(hash_sample(ds.select_columns([id_col, text_col]), id_col, frac,
                         seed=seed)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    u = hash_uniform(samp.column(id_col).to_numpy(), seed)
    order = np.lexsort((samp.column(id_col).to_numpy(), u))[:sample_size]
    samp = samp.take(pa.array(order))
    texts = [t for t in samp.column(text_col).to_pylist() if t]
    return bpe_train(texts, n_merges=n_merges)


def bpe_encode_op(ds, merges, *, text_col: str = "text",
                  id_col: str = "doc_id", concurrency: int | None = None):
    """Distributed encode: an actor pool compiles the rank table once
    per worker (__init__), each batch encodes per doc and emits
    (id_col, token ids list<int32>, n_tokens, n_bytes, tok-per-byte).
    The per-doc merge loop is the documented C-kernel swap point."""
    merges = list(merges)

    class Encoder:
        def __init__(self):
            self.ranks = {pair: (r, nid)
                          for r, (pair, nid) in enumerate(merges)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            ids_out, n_tok, n_byte = [], [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                enc = bpe_encode_bytes(b, self.ranks)
                ids_out.append(np.asarray(enc, dtype=np.int32))
                n_tok.append(len(enc))
                n_byte.append(len(b))
            n_tok = np.asarray(n_tok, dtype=np.int64)
            n_byte = np.asarray(n_byte, dtype=np.int64)
            with np.errstate(invalid="ignore", divide="ignore"):
                ratio = np.where(n_byte > 0, n_tok / n_byte, np.nan)
            return pa.table({
                id_col: batch.column(id_col),
                "tokens": pa.array(ids_out, pa.list_(pa.int32())),
                "n_tokens": pa.array(n_tok),
                "n_bytes": pa.array(n_byte),
                "tokens_per_byte": pa.array(ratio),
            })

    return ds.select_columns([id_col, text_col]).map_batches(
        Encoder, batch_format="pyarrow",
        concurrency=autoscale(concurrency or pool_size()))
