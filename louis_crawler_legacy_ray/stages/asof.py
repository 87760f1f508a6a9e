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
        keys = batch[key].to_pylist()
        ts = batch[left_ts].cast(pa.int64()).to_pylist()
        out = []
        for k, t in zip(keys, ts):
            entry = by_key.get(k)
            if entry is None:
                out.append(None)
                continue
            rts, vals = entry
            i = np.searchsorted(rts, t, side="right") - 1
            out.append(None if i < 0 else vals[i])
        return batch.append_column(out_col, pa.array(out))

    return left.map_batches(f, batch_format="pyarrow")
