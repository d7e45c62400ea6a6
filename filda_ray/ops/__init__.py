"""Named Dataset -> Dataset operators (the engine's operator surface).

Each operator mirrors a row of SURVEY.md §2 and documents the shuffle /
broadcast / partitioning choice it makes for the 100 TB scale path.
"""


def autoscale(concurrency):
    """Normalize an int pool size to an autoscaling (1, n) range so a
    chain of actor pools can never deadlock a small CPU budget (each
    pool can shrink to one actor under pressure)."""
    return (1, concurrency) if isinstance(concurrency, int) else concurrency


def input_size_bytes(ds):
    """Best-effort input size of a (possibly lazy) Dataset from plan
    metadata, WITHOUT triggering execution.

    ``Dataset.size_bytes()`` executes the plan when the top-level op
    lacks metadata, so it cannot be used for planning.  Instead walk
    the logical DAG upward until some ancestor (usually the Parquet
    read) knows its size — a map chain roughly preserves data volume,
    so the nearest known ancestor is a fine planning estimate.
    Returns ``None`` when nothing in the lineage knows.
    """
    try:
        node = ds._logical_plan.dag
        for _ in range(64):
            if node is None:
                return None
            meta = node.infer_metadata()
            if meta.size_bytes is not None:
                return meta.size_bytes
            deps = node.input_dependencies
            node = deps[0] if deps else None
    except Exception:
        return None
    return None


def derive_buckets(ds, *, bytes_per_bucket=256 << 20, lo=None, hi=65536,
                   default=64):
    """Default shuffle-bucket count proportional to input bytes.

    Every bounded-bucket shuffle in the engine (dedup_exact,
    distinct_rows, pair dedup, asof carry partitions, sessionize)
    processes ONE bucket as one vectorized pandas/numpy group, so a
    bucket must fit in a worker heap: size the count so a bucket is
    ~``bytes_per_bucket`` (default 256 MiB) of input.  A fixed
    constant (the round-2 default of 16/64) would make a bucket =
    corpus/64 at 100 TB.  Falls back to ``default`` when the lineage
    has no size metadata (rare: all engine entry points start at a
    Parquet read, whose size is known from file metadata).
    """
    if lo is None:
        # keep every core busy on small inputs: floor at 2x cluster CPUs
        lo = 16
        try:
            import ray

            if ray.is_initialized():
                lo = max(lo, 2 * int(ray.cluster_resources().get("CPU", 0)))
        except Exception:
            pass
    sz = input_size_bytes(ds)
    if sz is None:
        return max(default, lo)
    return int(min(hi, max(lo, -(-sz // bytes_per_bucket))))


def pool_size(*, frac: float = 0.5, lo: int = 4, hi: int = 64) -> int:
    """Default actor-pool width for a CPU-bound stateful stage: a
    fraction of cluster CPUs (several pools coexist in a pipeline),
    clamped.  A flat constant (the round-2 default of 4) starves a
    32-CPU node; this scales with the cluster like every shuffle
    knob."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus:
                return int(min(hi, max(lo, cpus * frac)))
    except Exception:
        pass
    return lo


def shuffle_partitions(n_groups_hint=None, *, per_cpu: int = 2, lo: int = 8,
                       hi: int = 256):
    """Hash-shuffle partition count for a ``groupby``: Ray Data's
    default is a flat 200, which spawns up to 64 aggregator actor
    processes regardless of cluster size — measured 27 s vs 1.6 s for
    the flagship background groupby at 8 vs 32 CPUs, almost all worker
    -process startup.  Scale partitions to the cluster (``per_cpu`` x
    CPUs, clamped) and never above the number of distinct groups when
    the caller knows it."""
    import ray

    cpus = 8
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    n = min(hi, max(lo, per_cpu * cpus))
    if n_groups_hint is not None:
        n = max(1, min(n, int(n_groups_hint)))
    return n


def pd_table(df):
    """pandas -> Arrow with schema metadata stripped.

    pa.Table.from_pandas embeds a 'pandas' metadata dict that makes the
    schema UNHASHABLE, so every Ray reduce task over map_groups output
    logs 'Failed to hash the schemas (for deduplication)'.  Group
    functions return through this helper to keep block schemas clean.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


