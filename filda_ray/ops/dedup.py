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
from . import autoscale, shuffle_partitions
from . import derive_buckets as autoscale_buckets

MAX_BUCKET = 1000  # runaway-bucket guard (drop, per ray_guide near-dup notes)
N_SHUFFLE_BUCKETS = 64


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_md5"):
    def f(batch: pa.Table) -> pa.Table:
        h = md5_hex(batch.column(text_col).to_pylist())
        return batch.append_column(out_col, pa.array(h, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int | None = None, *, keep: str = "first",
                priority_col: str | None = None):
    """Keep one row per distinct content (deterministic winner).

    Winner policy: ``keep='first'`` (default) takes the min ``id_col``
    row; ``keep='last'`` the max.  ``priority_col`` ranks BEFORE the
    id tie-break — e.g. ``priority_col='warc_ts', keep='last'`` is the
    keep-newest-crawl curation policy (max ts, max id among ts ties).

    Scale design: at web scale ~every document is unique, so a
    per-distinct-hash UDF (groupby(md5).map_groups) degrades to one
    Python call per row.  Instead the shuffle key is a BOUNDED hash
    bucket (md5's first 8 bytes % n_buckets — uniform by construction,
    no salting needed) and each bucket runs ONE vectorized sort +
    first-wins pass, the same pattern as ``relational.distinct_rows``
    and the minhash band buckets.  ``n_buckets`` defaults to
    bytes-proportional (``derive_buckets``) so a bucket stays ~one
    worker-heap's worth of rows at any corpus size.
    """
    if n_buckets is None:
        n_buckets = autoscale_buckets(ds)
    assert keep in ("first", "last")
    rank_cols = ([priority_col] if priority_col else []) + [id_col]
    asc = keep == "first"

    def hash_and_bucket(batch: pa.Table) -> pa.Table:
        from ..kernels.hashing import md5_hex64

        hexes, h64 = md5_hex64(batch.column(text_col).to_pylist())
        bk = (h64 % np.uint64(n_buckets)).astype(np.int32)
        # strip pandas metadata inherited from the parquet file schema:
        # it makes the schema unhashable and every shuffle-reduce task
        # logs 'Failed to hash the schemas'
        return batch.append_column("content_md5", pa.array(hexes, pa.string())) \
                    .append_column("__bk", pa.array(bk)).replace_schema_metadata(None)

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_md5"] + rank_cols,
                          ascending=[True] + [asc] * len(rank_cols),
                          kind="mergesort")
        cm = g["content_md5"]
        # null texts form ONE group (SQL GROUP BY semantics: md5(NULL)
        # is NULL and nulls group together) — plain ne() would treat
        # every None as distinct.  shift() leaves row 0 with a NaN
        # 'previous', so force-keep the first row.
        prev = cm.shift()
        same_as_prev = ((cm == prev) | (cm.isna() & prev.isna())).to_numpy()
        if len(same_as_prev):
            same_as_prev[0] = False
        from . import pd_table

        return pd_table(g.loc[~same_as_prev].drop(columns="__bk").reset_index(drop=True))

    return ds.map_batches(hash_and_bucket, batch_format="pyarrow").groupby(
        "__bk"
    , num_partitions=shuffle_partitions()).map_groups(first_wins, batch_format="pandas")


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
        ids = batch.column("doc_id").to_numpy()
        if len(ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], batch.column("doc_id").type),
                 "band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.uint64())}
            )
        # batch path (bit-identical to the per-doc scalar twins): one
        # Arrow tokenize + distinct-token blake2b + distinct-shingle
        # permutation map — the per-document Python loop was the hot
        # cost of this stage (6.4x on template-heavy corpora)
        flat, offs = textkit.shingle_hashes_batch(batch.column("text"), self.w)
        sigs = textkit.minhash_signature_matrix(flat, offs, self.a, self.b)
        bands = textkit.minhash_bands_matrix(sigs, NUM_BANDS)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, NUM_BANDS)),
                "band": pa.array(np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)),
                "band_hash": pa.array(bands.ravel(), pa.uint64()),
            }
        )


def _report_dropped(stage: str | None, n_buckets: int, n_rows: int):
    """Surface over-cap LSH-bucket drops through the metrics actor —
    the no-silent-caps rule: at web scale, template/boilerplate
    mega-buckets are exactly where the densest duplicates live, so a
    capped run must show up in the pipeline's telemetry, not vanish."""
    if not stage or n_buckets == 0:
        return
    try:
        from ..state.metrics import get_metrics_actor

        actor = get_metrics_actor()
        actor.add.remote(f"{stage}.dropped_buckets", n_buckets)
        actor.add.remote(f"{stage}.dropped_rows", n_rows)
    except Exception as e:  # telemetry must never fail the pair stage
        import sys

        print(f"warning: dropped-bucket telemetry lost for {stage}: {e}",
              file=sys.stderr)


def neardup_dropped_stats() -> dict[str, int]:
    """Snapshot of `<stage>.dropped_buckets` / `.dropped_rows` counters
    accumulated by the candidate-pair stages this session (empty dict =
    no bucket exceeded its cap; every candidate was examined)."""
    from ..state.metrics import snapshot

    return {k: v for k, v in snapshot().items()
            if k.endswith((".dropped_buckets", ".dropped_rows"))}


def _pairs_from_runs(key: np.ndarray, doc: np.ndarray, extra: np.ndarray | None = None,
                     max_run: int | None = None, stage: str | None = None):
    """Vectorized candidate-pair extraction from (bucket-key, doc_id)
    rows: lexsort, find equal-key runs, emit all intra-run pairs.
    Returns (doc_a, doc_b[, extra_a, extra_b]) with doc_a < doc_b.
    Runs longer than ``max_run`` (default MAX_BUCKET) are dropped —
    the runaway-bucket guard; drops are COUNTED and reported to the
    metrics actor under ``stage`` (never silent)."""
    cap = MAX_BUCKET if max_run is None else max_run
    order = np.lexsort((doc, key))
    k, d = key[order], doc[order]
    ex = extra[order] if extra is not None else None
    boundaries = np.flatnonzero(np.r_[True, k[1:] != k[:-1], True])
    out_a, out_b, ex_a, ex_b = [], [], [], []
    dropped_buckets = dropped_rows = 0
    for s, e in zip(boundaries[:-1], boundaries[1:]):
        n = e - s
        if n < 2 or n > cap:
            if n > cap:
                dropped_buckets += 1
                dropped_rows += int(n)
            continue
        ids = np.unique(d[s:e])
        if ids.size < 2:
            continue
        ai, bi = np.triu_indices(ids.size, k=1)
        out_a.append(ids[ai])
        out_b.append(ids[bi])
        if ex is not None:
            # map back one extra value per doc (first occurrence)
            first = {int(dd): ee for dd, ee in zip(d[s:e][::-1], ex[s:e][::-1])}
            ex_a.append(np.array([first[int(x)] for x in ids[ai]], dtype=ex.dtype))
            ex_b.append(np.array([first[int(x)] for x in ids[bi]], dtype=ex.dtype))
    _report_dropped(stage, dropped_buckets, dropped_rows)
    if not out_a:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty) if ex is None else (empty, empty, empty.astype(ex.dtype), empty.astype(ex.dtype))
    res = (np.concatenate(out_a), np.concatenate(out_b))
    if ex is None:
        return res
    return res + (np.concatenate(ex_a), np.concatenate(ex_b))


def _dedup_pairs_ds(cand, n_buckets: int | None = None):
    """Global (doc_a, doc_b) dedup via bounded hash buckets + one
    vectorized unique per bucket (no per-pair UDF calls)."""
    from ..kernels.hashing import splitmix64

    nb = n_buckets or autoscale_buckets(cand)

    def bucket(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy().astype(np.uint64)
        bb = b.column("doc_b").to_numpy().astype(np.uint64)
        h = splitmix64(a * np.uint64(0x9E3779B9) ^ bb)
        return b.append_column("__bk", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def uniq(g: pd.DataFrame):
        from . import pd_table

        g = g.drop(columns="__bk")
        return pd_table(g.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True))

    return cand.map_batches(bucket, batch_format="pyarrow").groupby("__bk", num_partitions=shuffle_partitions()).map_groups(
        uniq, batch_format="pandas"
    )


def minhash_lsh_pairs(ds, *, concurrency: int | None = None, shingle_w: int = 3):
    """Dataset op: documents -> candidate near-dup pairs (a < b).

    Scale design: the only rows shuffled are (band, band_hash, doc_id)
    signatures.  Buckets are BOUNDED shuffle groups (band_hash % 64),
    each processed by one vectorized UDF that finds equal-hash runs
    and emits intra-run pairs — never one Python/pandas call per LSH
    bucket (at web scale most buckets are singletons and per-group
    UDF dispatch dominates; measured 10x on the sf0.1 bench).
    """
    from ..kernels.hashing import hash_combine

    from . import pool_size

    nb = autoscale_buckets(ds)
    if concurrency is not None:
        banded = ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs={"shingle_w": shingle_w},
            batch_format="pyarrow",
            # signature computation is the CPU-bound stage: pool scales
            # with the cluster, and an explicit batch_size splits a
            # few-block corpus across the whole pool
            concurrency=autoscale(concurrency),
            batch_size=256,
        )
    else:
        # default: stateless tasks (elastic, no pool spin-up).  The
        # permutation params are seed-derived (microseconds), so the
        # stage carries no broadcast state at all; the explicit
        # batch_size still splits a few-block corpus across the
        # cluster.
        stage = MinHashStage(shingle_w=shingle_w)
        banded = ds.map_batches(stage.__call__, batch_format="pyarrow",
                                batch_size=256)

    def bucket(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy().astype(np.uint64)
        bh = b.column("band_hash").to_numpy()
        key = hash_combine(band, bh)  # composite (band, band_hash) key
        return pa.table(
            {
                "key": pa.array(key, pa.uint64()),
                "doc_id": b.column("doc_id"),
                "__bk": pa.array((key % np.uint64(nb)).astype(np.int32)),
            }
        )

    def pairs(g: pd.DataFrame):
        from . import pd_table

        a, b = _pairs_from_runs(
            g["key"].to_numpy().astype(np.uint64), g["doc_id"].to_numpy().astype(np.int64),
            stage="minhash_lsh",
        )
        return pd_table(pd.DataFrame({"doc_a": a, "doc_b": b}))

    cand = (
        banded.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bk", num_partitions=shuffle_partitions())
        .map_groups(pairs, batch_format="pandas")
    )
    return _dedup_pairs_ds(cand)


def _shingle_sig_stage(id_col: str, text_col: str, shingle_w: int):
    """map_batches fn: (id, text) -> (id, sig:large_binary) where sig is
    the sorted-unique uint64 shingle-hash set as raw little-endian bytes.
    Binary (not list<uint64>) so the column survives an Acero hash join
    (Acero rejects list payload columns)."""

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        flat, offs = textkit.shingle_hashes_batch(batch.column(text_col),
                                                  shingle_w)
        hs = [flat[offs[i]:offs[i + 1]].tobytes() for i in range(len(batch))]
        return pa.table({id_col: ids, "sig": pa.array(hs, pa.large_binary())})

    return sig


def _jaccard_from_sig_cols(batch: pa.Table, a_col: str, b_col: str) -> np.ndarray:
    """Per-row exact Jaccard between two binary signature columns."""
    sa = batch.column(a_col).combine_chunks() if isinstance(
        batch.column(a_col), pa.ChunkedArray) else batch.column(a_col)
    sb = batch.column(b_col).combine_chunks() if isinstance(
        batch.column(b_col), pa.ChunkedArray) else batch.column(b_col)
    empty = np.empty(0, dtype=np.uint64)

    def dec(v):
        return np.frombuffer(v, dtype=np.uint64) if v is not None else empty

    return np.fromiter(
        (textkit.jaccard(dec(x.as_py()), dec(y.as_py())) for x, y in zip(sa, sb)),
        dtype=np.float64, count=len(batch),
    )


def verify_jaccard_op(pairs, docs, *, text_col: str = "text", id_col: str = "doc_id",
                      shingle_w: int = 3, threshold: float = 0.7,
                      mode: str = "auto", broadcast_max_pairs: int = 100_000,
                      broadcast_max_bytes: int = 128 << 20):
    """Distributed exact-Jaccard verification of LSH candidate pairs.

    Scale design: the expensive work — shingling each candidate
    document — streams over the corpus as a ``map_batches`` stage,
    restricted to candidate ids so non-candidate documents are never
    shingled.  Two paths, chosen by MEASURED candidate-pair count:

    - ``broadcast`` (pair count <= ``broadcast_max_pairs``): candidate
      ids are semi-filtered by a broadcast key set and the signature
      table is ``ray.put`` once; verification streams over pairs.
      One round-trip fewer than the join path; right whenever the LSH
      rare-candidate contract holds.
    - ``join`` (adversarial corpora — templated boilerplate where LSH
      emits pairs far beyond "rare"): nothing lands on the driver.
      Candidate ids = distinct-rows over both pair sides; candidate
      docs = hash join docs x ids; signatures joined back to pairs on
      doc_a then doc_b via two hash joins.  Driver holds only the
      pair COUNT.

    Auto mode is guarded TWICE: by the measured pair count (protects
    the driver-side pairs gather) and then by the MEASURED signature
    bytes (``broadcast_max_bytes``, protecting the ``ray.put`` dict —
    the real constraint: long-shingle corpora can blow the byte budget
    well under the pair cap).  Signatures are computed once into the
    object store; a byte overflow falls through to the join path
    reusing them, so nothing is shingled twice.

    The pairs dataset is materialized once (object store, spillable —
    never the driver heap) to get the count and feed both joins.
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    auto = mode == "auto"
    if auto:
        mode = "broadcast" if n_pairs <= broadcast_max_pairs else "join"

    sig_fn = _shingle_sig_stage(id_col, text_col, shingle_w)
    sigs = None        # materialized signature Dataset, shared by both paths

    if mode == "broadcast":
        import pyarrow.compute as pc
        import ray

        from .relational import semi_anti_filter
        from .workercache import worker_state

        pairs_tbl = pa.concat_tables(
            list(pairs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        a = pairs_tbl.column("doc_a").to_numpy().astype(np.int64)
        b = pairs_tbl.column("doc_b").to_numpy().astype(np.int64)
        cand_ids = np.unique(np.concatenate([a, b])) if len(a) else np.empty(0, np.int64)

        cand_docs = semi_anti_filter(
            docs.select_columns([id_col, text_col]), cand_ids, on=id_col
        )
        sigs = cand_docs.map_batches(sig_fn, batch_format="pyarrow").materialize()
        if auto:
            # measured-bytes gate for the ray.put dict (mirrors
            # derive_buckets' bytes-proportional sizing): one tiny
            # aggregate over the materialized signatures
            sig_bytes = int(sigs.map_batches(
                lambda t: pa.table({"x": pa.array(
                    [pc.sum(pc.binary_length(t.column("sig"))).as_py() or 0],
                    pa.int64())}),
                batch_format="pyarrow").sum("x") or 0)
            if sig_bytes > broadcast_max_bytes:
                mode = "join"

    if mode == "broadcast":
        sig_tbl = pa.concat_tables(
            list(sigs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        by_id = {int(i): np.frombuffer(s, dtype=np.uint64)
                 for i, s in zip(sig_tbl.column(id_col).to_pylist(),
                                 sig_tbl.column("sig").to_pylist())}
        ref = ray.put(by_id)
        empty = np.empty(0, dtype=np.uint64)

        def verify(batch: pa.Table) -> pa.Table:
            d = worker_state(ref, lambda: ray.get(ref))
            aa = batch.column("doc_a").to_numpy()
            bb = batch.column("doc_b").to_numpy()
            j = np.fromiter(
                (textkit.jaccard(d.get(int(x), empty), d.get(int(y), empty))
                 for x, y in zip(aa, bb)),
                dtype=np.float64, count=len(aa),
            )
            out = batch.append_column("jaccard", pa.array(j))
            return out.filter(pa.array(j >= threshold))

        return pairs.map_batches(verify, batch_format="pyarrow")

    # --- fully distributed join path -------------------------------------
    from . import derive_buckets
    from .relational import distinct_rows, hash_join

    def both_sides(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b.column("doc_a").to_numpy().astype(np.int64),
            b.column("doc_b").to_numpy().astype(np.int64),
        ])
        return pa.table({id_col: pa.array(ids)})

    if sigs is None:
        ids_ds = distinct_rows(pairs.map_batches(both_sides, batch_format="pyarrow"),
                               [id_col])
        np_docs = derive_buckets(docs)
        cand_docs = hash_join(
            docs.select_columns([id_col, text_col]), ids_ds,
            on=id_col, how="inner", num_partitions=np_docs,
        )
        # signatures are consumed by TWO joins below; materialize once so
        # the shingling runs once (object store, spillable — not the driver)
        sigs = cand_docs.map_batches(sig_fn, batch_format="pyarrow").materialize()

    def rename(idc: str, sigc: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({idc: b.column(id_col), sigc: b.column("sig")})
        return f

    np_pairs = max(16, min(1024, -(-n_pairs // 500_000)))
    j = hash_join(pairs, sigs.map_batches(rename("doc_a", "sig_a"),
                                          batch_format="pyarrow"),
                  on="doc_a", how="inner", num_partitions=np_pairs)
    # barrier: without it BOTH JoinOperators run concurrently and their
    # aggregator actor pools can reserve every CPU on a small cluster,
    # starving the map stages that feed them (observed deadlock at
    # num_cpus=4).  Bounded by pairs volume; object store, spillable.
    j = j.materialize()
    j = hash_join(j, sigs.map_batches(rename("doc_b", "sig_b"),
                                      batch_format="pyarrow"),
                  on="doc_b", how="inner", num_partitions=np_pairs)

    def verify_joined(batch: pa.Table) -> pa.Table:
        jac = _jaccard_from_sig_cols(batch, "sig_a", "sig_b")
        out = batch.drop_columns(["sig_a", "sig_b"]).append_column(
            "jaccard", pa.array(jac))
        return out.filter(pa.array(jac >= threshold))

    return j.map_batches(verify_joined, batch_format="pyarrow")


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
    from ..kernels.hashing import hash_combine

    nb = autoscale_buckets(ds)

    def bucket(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy().astype(np.uint64)
        bh = b.column("band_hash").to_numpy()
        key = hash_combine(band, bh)
        return pa.table(
            {
                "key": pa.array(key, pa.uint64()),
                "doc_id": b.column("doc_id"),
                "simhash": b.column("simhash"),
                "__bk": pa.array((key % np.uint64(nb)).astype(np.int32)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, sa, sb = _pairs_from_runs(
            g["key"].to_numpy().astype(np.uint64),
            g["doc_id"].to_numpy().astype(np.int64),
            g["simhash"].to_numpy().astype(np.uint64),
            stage="simhash",
        )
        hd = textkit.hamming64(sa, sb) if len(a) else np.empty(0, dtype=np.int64)
        keep = hd <= max_hamming
        from . import pd_table

        return pd_table(pd.DataFrame(
            {"doc_a": a[keep], "doc_b": b[keep], "hamming": hd[keep].astype(np.int64)}
        ))

    cand = (
        banded.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bk", num_partitions=shuffle_partitions())
        .map_groups(pairs, batch_format="pandas")
    )
    return _dedup_pairs_ds(cand)


# ---------------------------------------------------------------------------
# Prefix-candidate + exact edit-distance near-dup
# ---------------------------------------------------------------------------


def edit_distance_pairs(docs, *, prefix_len: int = 30, id_col: str = "doc_id",
                        text_col: str = "text", mode: str = "auto",
                        broadcast_max_pairs: int = 100_000):
    """Candidate pairs by shared exact text prefix, verified with the
    exact Levenshtein distance (templated/boilerplate near-dup family
    the shingle ops under-weight: a one-char edit in a long doc has
    Jaccard ~1 but the edit distance pinpoints how close).

    Scale design mirrors the LSH ops: stage 1 shuffles ONLY
    (prefix-hash, doc_id) rows into bounded buckets and emits
    candidate id pairs (``_pairs_from_runs``); texts never move.
    Stage 2 attaches texts and scores with ``levenshtein_batch`` —
    one vectorized DP across the whole batch of pairs.  Mode picks by
    MEASURED pair count like ``verify_jaccard_op``: ``broadcast``
    gathers only candidate texts (<= 2x pair count docs) via
    ``ray.put``; ``join`` keeps everything distributed with two hash
    joins.  Hash collisions in stage 1 (different prefixes, same
    64-bit hash) are removed in stage 2 by comparing the REAL
    prefixes, so output equals the exact self-join semantics.
    """
    from ..kernels.hashing import content_hash64

    def key_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        pref = pc.utf8_slice_codeunits(batch.column(text_col), 0, prefix_len)
        h = content_hash64(pref.to_pylist())
        return pa.table({"key": pa.array(h, pa.uint64()),
                         id_col: batch.column(id_col)})

    nb = autoscale_buckets(docs)

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy()
        return b.append_column("__bk", pa.array((k % np.uint64(nb)).astype(np.int32)))

    def pairs_fn(g: pd.DataFrame):
        from . import pd_table

        a, b = _pairs_from_runs(
            g["key"].to_numpy().astype(np.uint64),
            g[id_col].to_numpy().astype(np.int64),
            stage="prefix_editdist")
        return pd_table(pd.DataFrame({"doc_a": a, "doc_b": b}))

    cand = (docs.select_columns([id_col, text_col])
            .map_batches(key_rows, batch_format="pyarrow")
            .map_batches(bucket, batch_format="pyarrow")
            .groupby("__bk", num_partitions=shuffle_partitions())
            .map_groups(pairs_fn, batch_format="pandas"))
    pairs = _dedup_pairs_ds(cand).materialize()
    n_pairs = pairs.count()
    if mode == "auto":
        mode = "broadcast" if n_pairs <= broadcast_max_pairs else "join"

    def score(batch: pa.Table, ta: list, tb: list) -> pa.Table:
        same_pref = np.fromiter(
            ((x or "")[:prefix_len] == (y or "")[:prefix_len]
             and x is not None and y is not None for x, y in zip(ta, tb)),
            dtype=bool, count=len(ta))
        d = textkit.levenshtein_batch(ta, tb)
        out = batch.append_column("edit_dist", pa.array(d, pa.int64()))
        return out.filter(pa.array(same_pref))

    if mode == "broadcast":
        import ray

        from .relational import semi_anti_filter
        from .workercache import worker_state

        ids = np.unique(np.concatenate([
            np.concatenate([b.column("doc_a").to_numpy(),
                            b.column("doc_b").to_numpy()])
            for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None)
        ] or [np.empty(0, np.int64)]).astype(np.int64))
        cand_docs = semi_anti_filter(
            docs.select_columns([id_col, text_col]), ids, on=id_col)
        texts = {}
        for b in cand_docs.iter_batches(batch_format="pyarrow", batch_size=None):
            texts.update(zip(b.column(id_col).to_pylist(),
                             b.column(text_col).to_pylist()))
        ref = ray.put(texts)

        def verify(batch: pa.Table) -> pa.Table:
            t = worker_state(ref, lambda: ray.get(ref))
            ta = [t.get(int(x)) for x in batch.column("doc_a").to_pylist()]
            tb = [t.get(int(y)) for y in batch.column("doc_b").to_pylist()]
            return score(batch, ta, tb)

        return pairs.map_batches(verify, batch_format="pyarrow")

    # fully distributed join path (adversarial templated corpora)
    from .relational import hash_join

    def rename(idc: str, txc: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({idc: b.column(id_col), txc: b.column(text_col)})
        return f

    np_pairs = max(16, min(1024, -(-n_pairs // 500_000)))
    txt = docs.select_columns([id_col, text_col])
    j = hash_join(pairs, txt.map_batches(rename("doc_a", "text_a"),
                                         batch_format="pyarrow"),
                  on="doc_a", how="inner", num_partitions=np_pairs)
    j = j.materialize()  # same two-join barrier as verify_jaccard_op
    j = hash_join(j, txt.map_batches(rename("doc_b", "text_b"),
                                     batch_format="pyarrow"),
                  on="doc_b", how="inner", num_partitions=np_pairs)

    def verify_joined(batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        return score(batch.drop_columns(["text_a", "text_b"]), ta, tb)

    return j.map_batches(verify_joined, batch_format="pyarrow")


def dedup_incremental(new_ds, prior_ds, *, text_col: str = "text",
                      id_col: str = "doc_id", keep: str = "first",
                      priority_col: str | None = None):
    """Incremental exact dedup of a NEW crawl against a PRIOR corpus,
    then within the new crawl itself — the recurring-crawl curation
    step (yesterday's corpus never reprocesses).

    Scale design: the prior side contributes ONLY its content hashes
    (one narrow column); the anti join is Bloom-prefiltered
    (``bloom.bloom_semi_anti_join``) so non-colliding new rows —
    ~all of them on a real crawl — never shuffle, and exactness is
    restored by the verify stage.  Survivors then run the bounded-
    bucket ``dedup_exact``.  Null-text rows are dropped up front on
    both sides (SQL NOT EXISTS semantics for NULL keys is
    join-strategy-dependent; the contract excludes them).
    """
    import pyarrow.compute as pc

    from .bloom import bloom_semi_anti_join

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column(text_col)))

    new_h = add_content_hash(new_ds.map_batches(drop_null, batch_format="pyarrow"),
                             text_col=text_col)
    prior_h = add_content_hash(
        prior_ds.select_columns([text_col]).map_batches(drop_null,
                                                        batch_format="pyarrow"),
        text_col=text_col).select_columns(["content_md5"])
    surv = bloom_semi_anti_join(new_h, prior_h, on="content_md5", anti=True)
    surv = surv.map_batches(lambda b: b.drop_columns(["content_md5"]),
                            batch_format="pyarrow")
    return dedup_exact(surv, text_col=text_col, id_col=id_col, keep=keep,
                       priority_col=priority_col)
