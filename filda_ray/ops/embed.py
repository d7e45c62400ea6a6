"""Embedding similarity operators (engine additions).

- ``cosine_topk``: brute-force top-k vs a broadcast query matrix —
  numpy matmul per batch (the baseline ANN path).  The query matrix is
  ray.put once; each batch does one GEMM.
- ``lsh_bucket_topk``: random-hyperplane LSH bucketing as the scale
  path: probe only rows whose sign-bucket matches the query's (or is
  within 1 bit), trading recall for a ~2^bits search-space cut.
- ``embedding_neardup``: cosine near-duplicate pairs via the same
  sign-LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from . import autoscale, shuffle_partitions


def _to_matrix(col, dtype=np.float32) -> np.ndarray:
    """list<float> column -> (n, d) matrix WITHOUT per-row Python:
    flatten the Arrow values buffer (zero-copy for non-null fixed-width
    data) and reshape.  Falls back to to_pylist only for ragged/null
    lists, which embedding columns never are."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t) and col.null_count == 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), t.list_size).astype(dtype, copy=False)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and col.null_count == 0:
        offsets = col.offsets.to_numpy()
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all():
            d = int(widths[0])
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), d).astype(dtype, copy=False)
    return np.asarray(col.to_pylist(), dtype=dtype)


class CosineTopK:
    """Actor: query matrix fetched once per actor; per-batch GEMM emits
    the batch-local top-k (merged by a tiny final sort.limit).

    dtype float32 is the scale default; float64 when downstream
    comparisons need double precision (e.g. SQL oracles)."""

    def __init__(self, q_ref, k: int, dtype=np.float32):
        import ray

        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        self.dtype = dtype
        self.q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(dtype)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _to_matrix(batch.column("embedding"), self.dtype)
        ids = batch.column("vec_id").to_numpy()
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = n @ self.q.T  # (rows, nq)
        out_id, out_q, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            k = min(self.k, s.shape[0])
            top = np.argpartition(-s, k - 1)[:k]
            out_id.append(ids[top])
            out_q.append(np.full(k, qi, dtype=np.int32))
            out_s.append(s[top].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def cosine_topk(ds, queries: np.ndarray, k: int = 10, *,
                concurrency: int | None = None, dtype=np.float32):
    """Dataset op: embeddings -> global top-k rows per query by cosine.

    Per-batch partial top-k (map_batches GEMM) then one small
    sort+limit per query — the shuffle carries k rows per (batch,
    query), not the corpus.
    """
    # the query matrix is tiny (nq x dim): capture it in the closure
    # (serialized with the task spec) — object-store constructor args
    # make restartable actors fragile (ray#53727) and log an
    # error-level advisory.  Default deployment is stateless tasks
    # (elastic, no pool spin-up); pass ``concurrency`` for a pool.
    q = np.asarray(queries, dtype=dtype)

    if concurrency is not None:
        class Stage(CosineTopK):
            def __init__(self):
                super().__init__(q, k, dtype)

        partial = ds.map_batches(
            Stage,
            batch_format="pyarrow",
            concurrency=autoscale(concurrency),
        )
    else:
        st = CosineTopK(q, k, dtype)
        partial = ds.map_batches(st.__call__, batch_format="pyarrow")

    def final(g: pd.DataFrame):
        from . import pd_table

        return pd_table(g.sort_values(["cosine", "vec_id"],
                                      ascending=[False, True]).head(k))

    return partial.groupby("query_id", num_partitions=shuffle_partitions()).map_groups(final, batch_format="pandas")


def sign_buckets(v: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane sign bucket (uint64) per row."""
    bits = (v @ planes.T) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def make_planes(dim: int, nbits: int = 12, seed: int = 4) -> np.ndarray:
    return np.random.RandomState(seed).randn(nbits, dim).astype(np.float32)


def kmeans_fit(sample: np.ndarray, k: int, *, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Seeded spherical k-means on a driver-side sample (unit-norm
    centroids; cosine assignment).  Deterministic; small k only."""
    rng = np.random.RandomState(seed)
    n = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = n[rng.choice(len(n), size=min(k, len(n)), replace=False)].copy()
    for _ in range(iters):
        assign = (n @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = n[m].mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_build(ds, out_dir: str, *, n_centroids: int = 64, sample_size: int = 2000,
              iters: int = 10, seed: int = 0):
    """Build an IVF index: centroids from a driver-side sample, every
    vector assigned to its nearest centroid in map_batches, corpus
    written as Parquet PARTITIONED BY CENTROID (resumable manifest
    product).  This is the ANN path that can SKIP BLOCKS: a query
    reads only its probed centroids' partitions, never the corpus.
    Centroids are stored beside the partitions for the query side.

    Sizing at scale: the writer materializes ONE partition per task,
    so choose ``n_centroids`` such that corpus_rows / n_centroids fits
    a worker's heap (the usual IVF cell-size requirement — real IVF
    indexes use thousands of cells for billion-vector corpora).
    """
    import ray
    import pyarrow.parquet as pq

    from ..state.manifest import write_product
    from .sample import hash_sample, hash_uniform
    from .workercache import worker_state

    # training sample must be RANDOM, not a storage-order head: a
    # sorted/clustered corpus would bias the centroids toward the
    # first rows' cluster.  Deterministic hash-Bernoulli at ~2x the
    # target size, trimmed to sample_size by the same hash order.
    n_rows = max(ds.count(), 1)
    frac = min(1.0, (2.0 * sample_size) / n_rows)
    samp = pa.concat_tables(
        list(hash_sample(ds.select_columns(["vec_id", "embedding"]),
                         "vec_id", frac, seed=seed)
             .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    if len(samp) > sample_size:
        u = hash_uniform(samp.column("vec_id").to_numpy(), seed)
        samp = samp.take(pa.array(np.argsort(u, kind="stable")[:sample_size]))
    cent = kmeans_fit(_to_matrix(samp.column("embedding"), np.float32), n_centroids,
                      iters=iters, seed=seed)
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = worker_state(ref, lambda: ray.get(ref))
        v = _to_matrix(batch.column("embedding"))
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        a = (n @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(a))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    done = write_product(assigned, out_dir, partition_col="centroid",
                         lineage={"index": "ivf", "n_centroids": int(len(cent)),
                                  "seed": seed, "iters": iters})
    import os

    d = cent.shape[1]
    pq.write_table(
        pa.table({"centroid": pa.array(np.arange(len(cent), dtype=np.int32)),
                  "vec": pa.FixedSizeListArray.from_arrays(
                      pa.array(cent.ravel(), pa.float32()), d)}),
        os.path.join(out_dir, "_centroids.parquet"),
    )
    return done


def ivf_topk(index_dir: str, queries: np.ndarray, k: int = 10, *, nprobe: int = 8,
             dtype=np.float64):
    """ANN query against an ``ivf_build`` index: probe the ``nprobe``
    nearest centroids per query and READ ONLY THOSE PARTITIONS from
    storage — at 100 TB this touches nprobe/n_centroids of the bytes,
    unlike the sign-LSH path which scans (then prunes) every block.
    Recall < 1 by design; ``cosine_topk`` is the exactness oracle.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    ct = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cent = _to_matrix(ct.column("vec"), np.float32)
    q = np.asarray(queries, dtype=np.float64)
    qn = (q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12))
    sims = qn.astype(np.float32) @ cent.T
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-sims, axis=1)[:, :nprobe]          # (nq, nprobe)
    needed = sorted({int(c) for row in probes for c in row})
    # a centroid that won zero vectors (dead k-means cell) has no
    # part=<c>/ directory — probe only partitions that exist
    paths = [p for c in needed
             if os.path.exists(p := os.path.join(index_dir, f"part={c}", "data.parquet"))]
    if not paths:  # every probed cell was dead
        return rd.from_arrow(pa.table({"query_id": pa.array([], pa.int32()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "centroid"])

    # membership matrix: query x centroid -> probe?
    member = np.zeros((len(qn), cent.shape[0]), dtype=bool)
    member[np.repeat(np.arange(len(qn)), nprobe), probes.ravel()] = True

    def partial(batch: pa.Table) -> pa.Table:
        v = _to_matrix(batch.column("embedding"), dtype)
        ids = batch.column("vec_id").to_numpy()
        cen = batch.column("centroid").to_numpy()
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        s = n @ qn.T.astype(dtype)                          # (rows, nq)
        out_id, out_q, out_s = [], [], []
        for qi in range(s.shape[1]):
            sel = member[qi][cen]
            if not sel.any():
                continue
            sv = s[sel, qi]
            kk = min(k, sv.shape[0])
            top = np.argpartition(-sv, kk - 1)[:kk]
            out_id.append(ids[sel][top])
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_s.append(sv[top].astype(np.float64))
        if not out_id:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_s))})

    part = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return part.groupby("query_id", num_partitions=shuffle_partitions()).map_groups(final, batch_format="pandas")


def embedding_neardup(ds, *, threshold: float = 0.9, nbits: int = 10,
                      n_tables: int = 8, seed: int = 4, max_bucket: int = 2000):
    """Embedding-cosine near-duplicate pairs via multi-table sign-LSH.

    Scale design (mirrors the MinHash band pattern): each vector is
    bucketed by ``n_tables`` independent random-hyperplane tables; the
    shuffle carries (table, bucket, vec_id, unit vector) rows — dim x
    n_tables floats per vector, never all-pairs.  Each (table, bucket)
    group runs ONE GEMM and emits upper-triangle pairs with cosine >=
    threshold; cross-table duplicates collapse in bounded hash
    buckets.  Groups above ``max_bucket`` are dropped (runaway guard).
    Recall < 1 by design (1-(1-p^nbits)^n_tables); exact duplicates
    always collide, so the exact-dup path has recall 1.
    """
    import pandas as pd

    def emit(batch: pa.Table) -> pa.Table:
        v = _to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        if len(ids) == 0:
            return pa.table(
                {"table_id": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.uint64()),
                 "vec_id": pa.array([], batch.column("vec_id").type),
                 "emb": pa.array([], pa.large_list(pa.float32()))}
            )
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        d = n.shape[1]
        tabs, bks, vid = [], [], []
        for t in range(n_tables):
            planes = make_planes(d, nbits, seed=seed + 1000 * t)
            bks.append(sign_buckets(n, planes))
            tabs.append(np.full(len(ids), t, dtype=np.int32))
            vid.append(ids)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(n, (n_tables, 1)).ravel(), pa.float32()), d
        )
        return pa.table(
            {"table_id": pa.array(np.concatenate(tabs)),
             "bucket": pa.array(np.concatenate(bks), pa.uint64()),
             "vec_id": pa.array(np.concatenate(vid)),
             "emb": emb}
        )

    # bucketed pair stage: groups are 16x-oversampled hash buckets of
    # the (table, bucket) composite key, NOT the key itself — one call
    # covers many LSH buckets (equal-key runs), so there is never a
    # Python/pandas dispatch per distinct bucket (billions at corpus
    # scale).  Pair cosines are row-gathered dot products — the same
    # flops as the old per-group GEMM upper triangle.
    from ..kernels.hashing import hash_combine, splitmix64
    from .dedup import _dedup_pairs_ds, _pairs_from_runs

    nb = shuffle_partitions()

    def add_key(b: pa.Table) -> pa.Table:
        t = b.column("table_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = b.column("bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = hash_combine(t, bk)
        return pa.table(
            {"key": pa.array(key, pa.uint64()),
             "vec_id": b.column("vec_id"),
             "emb": b.column("emb"),
             "__bk": pa.array((splitmix64(key) % np.uint64(16 * nb)).astype(np.int64))}
        )

    def pairs(g: pd.DataFrame):
        from . import pd_table

        key = g["key"].to_numpy().astype(np.uint64)
        ids = g["vec_id"].to_numpy().astype(np.int64)
        pos = np.arange(len(g), dtype=np.int64)
        a, b, pa_, pb_ = _pairs_from_runs(key, ids, extra=pos,
                                          max_run=max_bucket,
                                          stage="embedding_neardup")
        if len(a) == 0:
            return pd_table(pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                          "doc_b": pd.Series(dtype=np.int64),
                                          "cosine": pd.Series(dtype=np.float64)}))
        m = np.vstack(g["emb"].to_numpy()).astype(np.float32)
        cos = np.einsum("ij,ij->i", m[pa_], m[pb_]).astype(np.float64)
        keep = cos >= threshold
        return pd_table(pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep],
                                      "cosine": cos[keep]}))

    cand = (ds.map_batches(emit, batch_format="pyarrow")
            .map_batches(add_key, batch_format="pyarrow")
            .groupby("__bk", num_partitions=nb)
            .map_groups(pairs, batch_format="pandas"))
    return _dedup_pairs_ds(cand)


def lsh_bucket_topk(ds, queries: np.ndarray, k: int = 10, *, nbits: int = 8,
                    concurrency: int | None = None):
    """ANN scale path: probe only batches' rows in the query's sign
    bucket (multi-probe: Hamming<=1 buckets).  Recall < 1 by design;
    the brute-force op is the exactness oracle.  Default deployment is
    stateless tasks with the (queries, planes, probe-set) broadcast
    cached per worker; pass ``concurrency`` for an explicit pool."""
    import ray

    q = np.asarray(queries, dtype=np.float32)
    planes = make_planes(q.shape[1], nbits)
    qb = sign_buckets(q / np.linalg.norm(q, axis=1, keepdims=True), planes)
    # multi-probe set: exact bucket + 1-bit flips
    probe = {int(b) for b in qb}
    for b in list(probe):
        for i in range(nbits):
            probe.add(b ^ (1 << i))
    q_ref = ray.put((q, planes, np.array(sorted(probe), dtype=np.uint64)))

    class Stage:
        def __init__(self):
            qq, pl, pr = ray.get(q_ref)
            self.q = (qq / np.linalg.norm(qq, axis=1, keepdims=True)).astype(np.float32)
            self.planes = pl
            self.probe = pr
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _to_matrix(batch.column("embedding"))
            ids = batch.column("vec_id").to_numpy()
            n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            b = sign_buckets(n, self.planes)
            sel = np.isin(b, self.probe)
            if not sel.any():
                return pa.table(
                    {"query_id": pa.array([], pa.int32()),
                     "vec_id": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            n, ids = n[sel], ids[sel]
            sims = n @ self.q.T
            out_id, out_q, out_s = [], [], []
            for qi in range(sims.shape[1]):
                s = sims[:, qi]
                kk = min(self.k, s.shape[0])
                top = np.argpartition(-s, kk - 1)[:kk]
                out_id.append(ids[top])
                out_q.append(np.full(kk, qi, dtype=np.int32))
                out_s.append(s[top].astype(np.float64))
            return pa.table(
                {"query_id": pa.array(np.concatenate(out_q)),
                 "vec_id": pa.array(np.concatenate(out_id)),
                 "cosine": pa.array(np.concatenate(out_s))}
            )

    if concurrency is not None:
        partial = ds.map_batches(Stage, batch_format="pyarrow",
                                 concurrency=autoscale(concurrency))
    else:
        from .workercache import worker_state

        def fn(batch: pa.Table) -> pa.Table:
            return worker_state(q_ref, Stage)(batch)

        partial = ds.map_batches(fn, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partial.groupby("query_id", num_partitions=shuffle_partitions()).map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (cluster-balanced curation / corpus maps)
# ---------------------------------------------------------------------------


def sample_matrix(ds, sample_size: int, *, id_col: str = "vec_id",
                  vec_col: str = "embedding", seed: int = 0,
                  dtype=np.float64) -> np.ndarray:
    """Deterministic hash-random training sample as a dense matrix.

    Hash-Bernoulli at ~2x the target fraction, then canonicalized by
    (hash, id) order and trimmed: iter_batches block order is NOT
    deterministic under the streaming executor, and samplers that pick
    rows by position (rng.choice) need a run-order-independent layout.
    """
    from .sample import hash_sample, hash_uniform

    n_rows = max(ds.count(), 1)
    frac = min(1.0, (2.0 * sample_size) / n_rows)
    samp = pa.concat_tables(
        list(hash_sample(ds.select_columns([id_col, vec_col]), id_col, frac,
                         seed=seed)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    u = hash_uniform(samp.column(id_col).to_numpy(), seed)
    order = np.lexsort((samp.column(id_col).to_numpy(), u))[:sample_size]
    samp = samp.take(pa.array(order))
    return _to_matrix(samp.column(vec_col), dtype)


def lloyd_numpy(x: np.ndarray, k: int, *, iters: int = 10,
                seed: int = 0) -> np.ndarray:
    """Plain Euclidean Lloyd on an in-memory sample (driver-side
    trainer for PQ subquantizers and the distributed k-means init).
    Empty cells keep their previous centroid."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None]
        a = d2.argmin(1)
        for j in range(len(cent)):
            m = a == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def kmeans_distributed(ds, *, k: int = 8, iters: int = 5,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       seed: int = 0, sample_size: int = 2000):
    """Full-corpus Euclidean Lloyd's k-means, the canonical scalable
    shape: centroids are INITIALIZED from a deterministic hash-random
    sample (``kmeans_fit`` refined on the driver — k x dim is tiny),
    then each Lloyd iteration is one streaming pass: a ``map_batches``
    partial emits ONE (centroid, count, sum-blob) row per centroid per
    block (vectors themselves never shuffle), a bounded groupby sums
    the blobs, and the k-row result updates centroids driver-side.
    Empty cells keep their previous centroid.  ``iters`` full passes
    over the corpus — on 100 TB pick small iters and a large sample
    (the sample init does most of the work; Lloyd refines).

    Returns (centroids float64 (k, dim), per-cluster counts int64 (k,)).
    """
    import ray

    from . import pd_table
    from .workercache import worker_state

    sm = sample_matrix(ds, sample_size, id_col=id_col, vec_col=vec_col,
                       seed=seed)
    # Euclidean init: seeded distinct rows + driver Lloyd on the sample
    cent = lloyd_numpy(sm, k, iters=iters, seed=seed)
    counts = None

    narrow = ds.select_columns([vec_col])
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = worker_state(_ref, lambda: ray.get(_ref))
            v = _to_matrix(batch.column(vec_col), np.float64)
            if len(v) == 0:
                return pa.table({"centroid": pa.array([], pa.int32()),
                                 "n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.large_binary())})
            d2 = -2.0 * (v @ c.T) + (c * c).sum(1)[None]
            a = d2.argmin(1)
            sums = np.zeros((len(c), v.shape[1]), dtype=np.float64)
            np.add.at(sums, a, v)
            n = np.bincount(a, minlength=len(c)).astype(np.int64)
            occ = np.flatnonzero(n > 0)
            return pa.table({
                "centroid": pa.array(occ.astype(np.int32)),
                "n": pa.array(n[occ]),
                "s": pa.array([sums[j].tobytes() for j in occ], pa.large_binary()),
            })

        def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
            s = np.stack([np.frombuffer(b, np.float64) for b in g["s"]]).sum(axis=0)
            return pd_table(pd.DataFrame({
                "centroid": [int(g["centroid"].iloc[0])],
                "n": [int(g["n"].sum())],
                "s": [s.tobytes()],
            }))

        tiny = (narrow.map_batches(partial, batch_format="pyarrow")
                .groupby("centroid", num_partitions=shuffle_partitions())
                .map_groups(reduce_group, batch_format="pandas")
                .to_pandas())
        counts = np.zeros(len(cent), dtype=np.int64)
        for _, r in tiny.iterrows():
            j = int(r["centroid"])
            counts[j] = r["n"]
            cent[j] = np.frombuffer(r["s"], np.float64) / r["n"]
    return cent, counts


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  out_col: str = "cluster"):
    """Assign every row to its nearest (Euclidean) centroid — one GEMM
    per batch against the broadcast centroid matrix."""
    import ray

    from .workercache import worker_state

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        c = worker_state(ref, lambda: ray.get(ref))
        v = _to_matrix(batch.column(vec_col), np.float64)
        a = ((-2.0 * (v @ c.T)) + (c * c).sum(1)[None]).argmin(1).astype(np.int32)
        return batch.append_column(out_col, pa.array(a))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (compressed-scan ANN)
# ---------------------------------------------------------------------------


def pq_train(ds, *, m: int = 8, nbits: int = 8, sample_size: int = 2000,
             iters: int = 10, seed: int = 0, vec_col: str = "embedding",
             id_col: str = "vec_id") -> np.ndarray:
    """Train product-quantizer codebooks: split the (L2-normalized)
    vector into ``m`` contiguous subspaces and run Euclidean Lloyd
    with 2^nbits centroids per subspace on a deterministic hash-random
    sample (driver-side numpy — the sample is small; the corpus never
    leaves storage).  Returns float32 codebooks (m, 2^nbits, dsub).

    Normalizing first makes the asymmetric-distance inner product an
    approximation of COSINE, matching ``cosine_topk``'s metric.
    """
    sm = sample_matrix(ds, sample_size, id_col=id_col, vec_col=vec_col,
                       seed=seed)
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-12)
    d = sm.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub, k = d // m, min(1 << nbits, len(sm))
    books = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        books[j] = lloyd_numpy(sm[:, j * dsub:(j + 1) * dsub], k,
                               iters=iters, seed=seed + j)
    return books


def pq_encode(ds, codebooks: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id", code_col: str = "codes"):
    """Encode every vector to ``m`` uint8 codes (one GEMM per subspace
    per batch against the broadcast codebooks): dim x 4 bytes ->
    m bytes, the compressed representation an in-memory ANN scan holds
    at 100 TB.  Output: (id_col, code_col fixed_size_list<uint8, m>).
    """
    import ray

    from .workercache import worker_state

    m, k, dsub = codebooks.shape
    ref = ray.put(np.ascontiguousarray(codebooks))

    def f(batch: pa.Table) -> pa.Table:
        b = worker_state(ref, lambda: ray.get(ref))
        v = _to_matrix(batch.column(vec_col), np.float32)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(v), m), dtype=np.uint8)
        for j in range(m):
            s = v[:, j * dsub:(j + 1) * dsub]
            c = b[j]
            d2 = -2.0 * (s @ c.T) + (c * c).sum(1)[None]
            codes[:, j] = d2.argmin(1)
        return pa.table({
            id_col: batch.column(id_col),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
            k: int = 10, *, id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over PQ codes: per query a tiny
    (m, 2^nbits) inner-product LUT; each batch sums m LUT gathers to
    score every row — no decode, no float matrix, bytes-per-row = m.
    Per-batch partial top-k then one small grouped merge (the
    cosine_topk shuffle shape).  Returns (query_id, vec_id, score)
    where score approximates cosine."""
    m, nc, dsub = codebooks.shape
    q = np.asarray(queries, dtype=np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    # LUT[qi, j, c] = <q_sub, centroid_c>
    lut = np.einsum("qjd,jcd->qjc",
                    q.reshape(len(q), m, dsub), codebooks).astype(np.float32)

    def partial(batch: pa.Table) -> pa.Table:
        codes = _to_matrix(batch.column("codes"), np.uint8)
        ids = batch.column(id_col).to_numpy()
        n = len(codes)
        out_id, out_q, out_s = [], [], []
        for qi in range(lut.shape[0]):
            s = np.zeros(n, dtype=np.float32)
            for j in range(m):
                s += lut[qi, j][codes[:, j]]
            kk = min(k, n)
            top = np.argpartition(-s, kk - 1)[:kk]
            out_id.append(ids[top])
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_s.append(s[top].astype(np.float64))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "score": pa.array(np.concatenate(out_s))})

    def final(g: pd.DataFrame):
        from . import pd_table

        return pd_table(g.sort_values(["score", id_col],
                                      ascending=[False, True]).head(k))

    return (codes_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id", num_partitions=shuffle_partitions())
            .map_groups(final, batch_format="pandas"))
