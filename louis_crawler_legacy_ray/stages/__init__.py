def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 16) -> tuple[int, int]:
    """Actor-pool bounds sized to the cluster (autoscaling pool up to
    ~frac of CPUs) — a fixed (1, 4) cap starves a 32-core node.

    Never auto-initializes Ray (the driver owns the session): before
    ray.init it returns a conservative default."""
    import ray

    if not ray.is_initialized():
        return (lo, max(lo, min(hi, 8)))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return (lo, max(lo, min(hi, int(cpus * frac))))


def from_pandas_clean(df) -> "pyarrow.Table":  # noqa: F821
    """pandas -> Arrow WITHOUT the pandas schema metadata.

    Ray's block layer converts a pandas UDF return with
    pa.Table.from_pandas, which stamps a dict-valued 'pandas' entry
    into the schema metadata. Downstream sort/groupby operators then
    fail schema deduplication ('Failed to hash the schemas:
    unhashable type: dict') and fall off the fast path — a measured
    8x slowdown on a 7k-row two-key aggregate (1.6 s vs 0.2 s).
    Group reducers return through this helper instead of returning
    the DataFrame."""
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def bucketed_int_fold(
    ds, key_col: str, per_group_fn, num_buckets: int = 64
):
    """Bucketed vectorized group fold: append ``__b = key % num_buckets``
    (int64 key), group by the small int bucket, and run ``per_group_fn``
    (pandas DataFrame -> Arrow Table; it must drop ``__b`` implicitly by
    not emitting it) once per bucket. Replaces a per-key sort-aggregate
    — whose fixed cost dominates dimension-sized tables — with
    ``num_buckets`` vectorized pandas groupbys; every row of a key lands
    in one bucket, so any per-key aggregation is exact. The shared
    plumbing behind harmonic_centrality's and hyperball's final folds
    (and the duplicate_ngrams / ngram_jaccard pair aggregates, which
    fuse their bucket column into an upstream map)."""
    import numpy as np
    import pyarrow as pa

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__b", pa.array(k % num_buckets))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_group_fn, batch_format="pandas")
    )
