"""Byte-level BPE tokenizer — train on a deterministic sample, encode
distributed (the training-data "token counting" op with a REAL learned
vocabulary instead of a whitespace heuristic).

Scale shape mirrors ``embed.kmeans_distributed``: training reads a
hash-random sample (canonical order) and runs driver-side — BPE merge
selection is inherently sequential and the sample is small — while the
ENCODE pass is the distributed part: stateless tasks hold the
broadcast merge list once per worker process (worker_state; an
explicit actor pool via ``concurrency``) and map the corpus through
the VECTORIZED rank-by-rank numpy kernel (``bpe_encode_batch``): one boolean
scan + compress over the whole concatenated batch per merge, no
per-document Python loop.  A C tokenizer could still swap in behind
the same stage signature, but the numpy path is itself a production
hot path, not a placeholder.

Public-knowledge algorithm (Sennrich et al. 2016, byte-level per
GPT-2's public description); no external tokenizer code.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import autoscale


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
    ``ranks`` maps pair -> (rank, new_id)).

    Per-doc pure-Python REFERENCE implementation — kept as the oracle
    for ``bpe_encode_batch`` (the vectorized production path) and for
    single-string use; the distributed encode stage does not call it."""
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


def bpe_encode_batch(docs: list[bytes], merges) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized BPE encode of a whole batch at once: all docs are
    concatenated into one int32 symbol array with a -1 separator
    between docs (no pair can span it), then the merge list is applied
    RANK BY RANK with numpy masks across every doc simultaneously —
    one boolean scan + compress per merge instead of a Python loop per
    document.

    Rank-ascending global passes are EXACTLY equivalent to the
    per-doc "merge the lowest rank present, repeat" reference
    (``bpe_encode_bytes``, property-tested equal): merging pair r
    only creates adjacencies involving its new id, and any pair over
    that id was learned later in training, so every pair created by
    rank r has rank > r — lower ranks can never reappear.  Greedy
    left-to-right overlap handling (runs of a repeated symbol merge
    every other position) is reproduced by parity-within-run masks.

    Returns (values, offsets): token ids for doc i are
    values[offsets[i]:offsets[i+1]] — zero-copy constructible into an
    Arrow list<int32> column."""
    k = len(docs)
    if k == 0:
        return np.empty(0, np.int32), np.zeros(1, np.int64)
    parts = []
    for d in docs:
        parts.append(np.frombuffer(d, dtype=np.uint8).astype(np.int32))
        parts.append(np.array([-1], np.int32))
    s = np.concatenate(parts)
    for (a, b), nid in merges:
        if len(s) < 2:
            break
        m = np.flatnonzero((s[:-1] == a) & (s[1:] == b))
        if len(m) == 0:
            continue
        if a == b:
            # overlapping matches only occur for (x, x) pairs: within
            # each run of consecutive match positions, greedy
            # left-to-right takes every other one
            run_start = np.r_[True, np.diff(m) > 1]
            starts = m[run_start]
            run_id = np.cumsum(run_start) - 1
            m = m[((m - starts[run_id]) % 2) == 0]
        s[m] = nid
        keep = np.ones(len(s), dtype=bool)
        keep[m + 1] = False
        s = s[keep]
    sep = np.flatnonzero(s == -1)
    starts = np.r_[0, sep[:-1] + 1]
    lengths = sep - starts
    offsets = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return s[s != -1], offsets


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
    """Distributed encode over the VECTORIZED rank-by-rank numpy
    kernel (``bpe_encode_batch`` — no per-doc Python loop); emits
    (id_col, token ids list<int32>, n_tokens, n_bytes, tok-per-byte).

    Default deployment mirrors ``sources.gazetteer.geocode``: stateless
    tasks with the merge list broadcast once (``ray.put``) and cached
    per worker process (worker_state) — elastic, no actor-pool
    spin-up (measured 5.7 s -> 3.8 s on the 320k corpus).  Pass
    ``concurrency`` to force an explicit actor pool instead (same
    results)."""
    import ray

    from .workercache import worker_state

    merges = list(merges)
    mref = ray.put(merges)

    def encode_batch(batch: pa.Table, m) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        docs = [(t or "").encode("utf-8") for t in texts]
        values, offsets = bpe_encode_batch(docs, m)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(values, pa.int32()))
        n_tok = np.diff(offsets)
        n_byte = np.asarray([len(d) for d in docs], dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(n_byte > 0, n_tok / n_byte, np.nan)
        return pa.table({
            id_col: batch.column(id_col),
            "tokens": tokens,
            "n_tokens": pa.array(n_tok),
            "n_bytes": pa.array(n_byte),
            "tokens_per_byte": pa.array(ratio),
        })

    narrow = ds.select_columns([id_col, text_col])
    if concurrency is not None:
        class Encoder:
            def __init__(self):
                self.merges = ray.get(mref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                return encode_batch(batch, self.merges)

        return narrow.map_batches(Encoder, batch_format="pyarrow",
                                  concurrency=autoscale(concurrency))

    def fn(batch: pa.Table) -> pa.Table:
        return encode_batch(batch, worker_state(mref, lambda: ray.get(mref)))

    return narrow.map_batches(fn, batch_format="pyarrow")
