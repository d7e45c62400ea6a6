"""Named Dataset -> Dataset operators (the engine's operator surface).

Each operator mirrors a row of SURVEY.md §2 and documents the shuffle /
broadcast / partitioning choice it makes for the 100 TB scale path.
"""


def autoscale(concurrency):
    """Normalize an int pool size to an autoscaling (1, n) range so a
    chain of actor pools can never deadlock a small CPU budget (each
    pool can shrink to one actor under pressure)."""
    return (1, concurrency) if isinstance(concurrency, int) else concurrency


def pd_table(df):
    """pandas -> Arrow with schema metadata stripped.

    pa.Table.from_pandas embeds a 'pandas' metadata dict that makes the
    schema UNHASHABLE, so every Ray reduce task over map_groups output
    logs 'Failed to hash the schemas (for deduplication)'.  Group
    functions return through this helper to keep block schemas clean.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
