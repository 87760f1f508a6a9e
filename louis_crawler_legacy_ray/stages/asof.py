"""As-of join — an operator the reference lacks (task-brief custom
operator class): for each left row, the latest right row with the same
key and right_ts <= left_ts.

Shape (ray_guide "As-of / range join"): group the left side by key and
do a sorted ``searchsorted`` per group against the (small) right side's
per-key sorted timestamps, broadcast once. For two LARGE sides, bucket
both by key hash and run ``pd.merge_asof`` inside per-bucket groups —
the partitioning assumption is that a key's rows colocate in one
bucket (same key -> same bucket; no cross-bucket matches exist).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def asof_join_broadcast(
    left: ray.data.Dataset,
    right_df: pd.DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
) -> ray.data.Dataset:
    """Broadcast as-of: right side fits in memory; for each left row,
    take ``value_col`` of the latest right row at or before its ts.
    Deterministic: right rows deduped to one per (key, ts) keeping the
    max value (both engines then agree on ties)."""
    r = (
        right_df.groupby([key, right_ts], as_index=False)[value_col]
        .max()
        .sort_values([key, right_ts])
    )
    by_key: dict = {}
    for k, g in r.groupby(key):
        by_key[k] = (
            g[right_ts].astype("int64").to_numpy(),
            g[value_col].to_numpy(),
        )

    def f(batch: pa.Table) -> pa.Table:
        """Grouped searchsorted: sort the batch by key once, then ONE
        vectorized np.searchsorted per distinct key in the batch (keys
        per batch << rows per batch) — no per-row Python."""
        keys = np.asarray(batch[key].to_pylist(), dtype=object)
        ts = batch[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = np.full(len(keys), None, dtype=object)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        if len(sk):
            starts = np.flatnonzero(
                np.concatenate(([True], sk[1:] != sk[:-1]))
            )
            bounds = np.append(starts, len(sk))
            for bi in range(len(starts)):
                idxs = order[bounds[bi] : bounds[bi + 1]]
                entry = by_key.get(sk[bounds[bi]])
                if entry is None:
                    continue
                rts, vals = entry
                pos = np.searchsorted(rts, ts[idxs], side="right") - 1
                hit = pos >= 0
                out[idxs[hit]] = vals[pos[hit]]
        return batch.append_column(out_col, pa.array(out.tolist()))

    return left.map_batches(f, batch_format="pyarrow")


def asof_join_partitioned(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """As-of join for two LARGE sides: bucket both by ``hash(key) %
    num_buckets`` (ONE all-to-all shuffle), then ``pd.merge_asof``
    inside each bucket group. Partitioning assumption (documented per
    task brief): every row of a key hashes to the same bucket, so no
    cross-bucket matches exist. Semantics identical to
    :func:`asof_join_broadcast`: right deduped to one row per (key, ts)
    keeping the max value; left rows without a match get null.

    ``right`` must already expose the join key under the same name as
    ``left``'s ``key`` column."""
    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rschema = right.schema()
    rtypes = dict(zip(rschema.names, rschema.types))
    val_type = rtypes[value_col]
    if value_col in lcols or out_col in lcols:
        raise ValueError("value/out column collides with a left column")

    all_fields = [(n, ltypes[n]) for n in lcols] + [
        ("__lts", pa.int64()),
        ("__rts", pa.int64()),
        (value_col, val_type),
    ]

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if name == "__lts" and side == "l":
                    cols[name] = batch[left_ts].cast(pa.int64())
                elif name == "__rts" and side == "r":
                    cols[name] = batch[right_ts].cast(pa.int64())
                elif name == key and side == "r":
                    cols[name] = batch[key].cast(typ)
                elif side == "l" and name in batch.column_names:
                    cols[name] = batch[name]
                elif side == "r" and name == value_col:
                    cols[name] = batch[value_col]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            hashed = (
                pd.util.hash_pandas_object(
                    out[key].to_pandas(), index=False
                ).to_numpy()
                % num_buckets
            )
            out = out.append_column("__bucket", pa.array(hashed.astype("int32")))
            return out.append_column("__side", pa.array([side] * n, pa.string()))

        return f

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")
    both = lt.union(rt)

    out_fields = [(n, ltypes[n]) for n in lcols] + [(out_col, val_type)]

    def asof_group(g: pd.DataFrame) -> pa.Table:
        lg = g[g["__side"] == "l"][lcols + ["__lts"]]
        rg = g[g["__side"] == "r"][[key, "__rts", value_col]]
        rg = (
            rg.groupby([key, "__rts"], as_index=False)[value_col]
            .max()
            .sort_values("__rts", kind="mergesort")
        )
        lg = lg.sort_values("__lts", kind="mergesort")
        if len(lg) == 0:
            m = lg.assign(**{value_col: pd.Series([], dtype="object")})
        elif len(rg) == 0:
            m = lg.assign(**{value_col: None})
        else:
            m = pd.merge_asof(
                lg,
                rg,
                left_on="__lts",
                right_on="__rts",
                by=key,
                direction="backward",
            )
        return pa.table(
            {
                name: pa.array(
                    m[value_col if name == out_col else name],
                    type=typ,
                    from_pandas=True,
                )
                for name, typ in out_fields
            }
        )

    return both.groupby("__bucket").map_groups(asof_group, batch_format="pandas")
