"""Distributed prefix scan (cumulative sum over a global order).

The classic two-phase parallel scan expressed on Ray Data:

1. bucket every row by an ORDER-PRESERVING bucket key (range buckets
   over the order column — bucket keys sort in the same order as the
   rows they contain);
2. per-block (bucket, total) partials tree-fold through stages/fold.py
   (O(log blocks) depth, no all-to-all); the single root blob — one
   entry PER BUCKET, not per input row — becomes exclusive per-bucket
   offsets on the driver;
3. one ``groupby(bucket).map_groups`` that sorts each bucket locally
   and emits ``offset[bucket] + local_cumsum``.

Driver-side state is O(n_buckets) — a few thousand scalars at 100 TB —
never O(rows).  The within-bucket pass is a single vectorized
``np.cumsum``.  This primitive powers the training-data curation ops
that need a global sequential semantics without sequential execution:
token-budget corpus selection, GPT-style concat-and-split sequence
packing, and exact global ranks for a deterministic (seeded) corpus
shuffle.  The reference engine has no scan operator; these extend its
inventory per the task brief (large-scale training-data pipeline ops).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from . import from_pandas_clean

BUCKET_COL = "_scan_bucket"


def _group_sums(keys: np.ndarray, vals: np.ndarray):
    """(sorted unique keys, exact int64 per-key sums). np.add.at keeps
    the accumulation in int64 — np.bincount's float64 weights would
    silently lose bits past 2^53, violating the module contract."""
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(uniq.size, np.int64)
    np.add.at(sums, inv, vals)
    return uniq, sums


def _bucket_totals_merge(blobs: list[bytes]) -> bytes:
    """Tree-fold merge for per-block (bucket, total) partials: each
    blob is an int64 [2, n] array (row 0 = sorted bucket ids, row 1 =
    totals); summing by bucket is associative + commutative."""
    ks, vs = [], []
    for bl in blobs:
        if not bl:
            continue
        arr = np.frombuffer(bl, dtype=np.int64).reshape(2, -1)
        ks.append(arr[0])
        vs.append(arr[1])
    if not ks:
        return b""
    uniq, sums = _group_sums(np.concatenate(ks), np.concatenate(vs))
    return np.stack([uniq, sums]).tobytes()


def prefix_sum(
    ds: ray.data.Dataset,
    order_cols: list[str],
    val_col: str,
    bucket_fn: Callable[[pa.Table], pa.Array],
    out_excl: str = "prefix_excl",
    out_incl: str = "prefix_incl",
) -> ray.data.Dataset:
    """Attach exclusive/inclusive running sums of ``val_col`` in the
    global order defined by ``order_cols``.

    ``bucket_fn(batch) -> int64 array`` must be order-preserving:
    for rows a, b with order(a) < order(b), bucket(a) <= bucket(b).
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(BUCKET_COL, bucket_fn(batch))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # phase 1: per-block bucket-total partials fold through the
    # stages/fold.py task tree (O(log blocks) depth — replaces the r4
    # groupby shuffle + O(blocks-linear) driver take_all with no
    # all-to-all at all); the driver sees ONE root blob of
    # (bucket, total) pairs, O(n_buckets) which is dimension-sized by
    # the bucket_fn contract.
    from .fold import tree_fold_blobs

    def totals_partial(batch: pa.Table) -> pa.Table:
        bk = batch[BUCKET_COL].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if bk.size == 0:
            return pa.table({"bt": pa.array([], pa.binary())})
        uniq, sums = _group_sums(bk, vals)
        return pa.table(
            {"bt": pa.array([np.stack([uniq, sums]).tobytes()], pa.binary())}
        )

    root = tree_fold_blobs(
        bucketed.map_batches(totals_partial, batch_format="pyarrow"),
        "bt",
        _bucket_totals_merge,
    )
    offsets: dict[int, int] = {}
    acc = 0
    if root:
        arr = np.frombuffer(root, dtype=np.int64).reshape(2, -1)
        for b, s in zip(arr[0], arr[1]):  # merge emits buckets sorted
            offsets[int(b)] = acc
            acc += int(s)

    # phase 2: within-bucket vectorized cumsum + broadcast offset
    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        vals = g[val_col].to_numpy(dtype=np.int64)
        incl = np.cumsum(vals) + offsets[int(g[BUCKET_COL].iloc[0])]
        g[out_incl] = incl
        g[out_excl] = incl - vals
        return from_pandas_clean(g.drop(columns=[BUCKET_COL]))

    return bucketed.groupby(BUCKET_COL).map_groups(scan_group, batch_format="pandas")


def range_bucket(col: str, width: int) -> Callable[[pa.Table], pa.Array]:
    """Order-preserving buckets for an int64 order column: id // width."""

    def fn(batch: pa.Table) -> pa.Array:
        ids = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array(ids // width, pa.int64())

    return fn


def hex_prefix_bucket(col: str, chars: int = 2) -> Callable[[pa.Table], pa.Array]:
    """Order-preserving buckets for a lowercase-hex string order column
    (e.g. an md5 shuffle key): the first ``chars`` hex digits as an int
    — 256 buckets for chars=2, uniform by construction of the hash."""

    def fn(batch: pa.Table) -> pa.Array:
        keys = batch[col].to_pylist()
        return pa.array([int(k[:chars], 16) for k in keys], pa.int64())

    return fn
