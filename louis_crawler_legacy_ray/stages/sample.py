"""Deterministic stratified sampling over a keyed table.

Training-data pipelines need reproducible per-stratum samples ("K docs
per language") that do not depend on block layout or worker count. The
selector here is a Knuth multiplicative hash of the id — a total order
any engine (and the DuckDB oracle) can recompute — so the sample is a
pure function of the data, not of the execution.

Scale shape: each batch first reduces to its own K smallest hashes per
stratum (combiner), so the groupby shuffle carries at most
K x strata x blocks rows regardless of input size; the final per-
stratum top-K runs over those partials only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import from_pandas_clean

KNUTH = 2654435761
HASH_MOD = 1 << 32


def sample_hash(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — fits int64 for ids < 2^31."""
    return (ids.astype(np.int64) * KNUTH) % HASH_MOD


def stratified_sample(
    ds,
    key_col: str,
    id_col: str,
    k: int,
):
    """K rows per distinct ``key_col`` value: the K ids with the
    smallest multiplicative hash (ties impossible below 2^32 ids;
    id asc as the formal tie-break)."""

    def partial_topk(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: b[key_col].to_pandas(),
                id_col: b[id_col].to_pandas().astype(np.int64),
            }
        )
        df["_h"] = sample_hash(df[id_col].to_numpy())
        df = (
            df.sort_values(["_h", id_col])
            .groupby(key_col, sort=False)
            .head(k)
        )
        return from_pandas_clean(df)

    def final_topk(g: pd.DataFrame):
        g = g.sort_values(["_h", id_col]).head(k)
        return from_pandas_clean(
            pd.DataFrame({key_col: g[key_col].values, id_col: g[id_col].values})
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final_topk, batch_format="pandas")
    )


def grouped_topk(
    ds,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
):
    """Top-k rows per key by ``order_col`` (ties broken by
    ``tiebreak_col`` ascending), with a 1-based ``rank`` column.

    Same combiner shape as :func:`stratified_sample`: each batch keeps
    only its own k best per key before the shuffle, so the groupby
    carries at most k x keys x blocks rows."""

    def best(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            [order_col, tiebreak_col], ascending=[not descending, True]
        )

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = best(df).groupby(key_col, sort=False).head(k)
        return from_pandas_clean(df)

    def final(g: pd.DataFrame):
        g = best(g).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return from_pandas_clean(g)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pandas")
    )


def weighted_sample(
    ds,
    id_col: str,
    weight_col: str,
    k: int,
):
    """Deterministic weighted sample without replacement: the k rows
    with the smallest race key ``hash(id) / weight`` (an exponential-
    race selector — heavier rows draw smaller keys more often), ties
    by id. Like :func:`stratified_sample` the key is a pure function
    of the data, so the sample is independent of block layout and
    worker count, and the DuckDB oracle recomputes the same total
    order (integer-hash -> IEEE double division is exactly rounded in
    both engines).

    Combiner shape: per-batch k smallest keys, then one tiny merge of
    the k x blocks partials.
    """

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        w = b[weight_col].to_numpy().astype(np.float64)
        key = sample_hash(ids).astype(np.float64) / w
        order = np.lexsort((ids, key))[:k]
        t = b.take(pa.array(order))
        return t.append_column("_race_key", pa.array(key[order], pa.float64()))

    merged = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame):
        df = df.sort_values(["_race_key", id_col]).head(k)
        return from_pandas_clean(df.drop(columns=["_race_key"]).reset_index(drop=True))

    # partials are k x blocks rows -> single-group final merge
    return merged.repartition(1).map_batches(
        final, batch_format="pandas"
    )


def quota_mix(
    ds,
    key_col: str,
    id_col: str,
    quotas: dict,
):
    """Deterministic domain/language mixing to target QUOTAS: for each
    ``key_col`` value take the ``quotas[key]`` ids with the smallest
    multiplicative hash (id asc tie-break) — the DoReMi / Pile-style
    "hit these per-source proportions" selector, reproducible across
    engines and block layouts like :func:`stratified_sample`. Keys
    absent from ``quotas`` contribute nothing; a quota larger than the
    stratum takes the whole stratum.

    Scale shape: the per-batch combiner keeps at most quota[key] rows
    per key per block, so the groupby shuffle carries
    O(sum(quota) x blocks) rows — proportional to the OUTPUT, never
    the corpus. (For quotas approaching the corpus size the crawl
    control plane's iterative k-th-key selection is the driver-light
    shape; these mixing quotas are output-sized by construction.)"""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: b[key_col].to_pandas(),
                id_col: b[id_col].to_pandas().astype(np.int64),
            }
        )
        df["_h"] = sample_hash(df[id_col].to_numpy())
        df = df.sort_values(["_h", id_col])
        rk = df.groupby(key_col, sort=False).cumcount()
        q = df[key_col].map(quotas).fillna(0).astype(np.int64)
        return from_pandas_clean(df[rk.to_numpy() < q.to_numpy()])

    def final(g: pd.DataFrame):
        q = int(quotas.get(g[key_col].iloc[0], 0))
        g = g.sort_values(["_h", id_col]).head(q)
        return from_pandas_clean(
            pd.DataFrame({key_col: g[key_col].values, id_col: g[id_col].values})
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pandas")
    )


def temperature_resample(
    ds,
    key_col: str,
    id_col: str,
    coeff: int = 4,
):
    """Temperature-based domain/language resampling (the XLM-R / mT5
    multilingual recipe: sample stratum d with probability
    proportional to n_d^alpha, alpha < 1, to up-weight the tail
    without drowning the head). alpha is fixed at 0.5 so the quota
    is ``floor(coeff * sqrt(n_d))`` — sqrt is IEEE-exact (correctly
    rounded), so both engines and the DuckDB oracle compute the SAME
    integer quota from the same counts; no float-threshold hash risk.

    Unlike :func:`quota_mix` the quotas are DERIVED FROM THE DATA:
    one Count groupby produces the per-stratum histogram (one row
    per stratum — driver-tiny at any corpus size), quotas follow,
    and selection reuses the quota_mix multiplicative-hash rank so
    the sample is a pure function of the table. Scale shape: the
    count groupby is combiner-pruned by Ray Data, the selection
    shuffle is output-sized (see quota_mix).
    """
    import math

    from ray.data.aggregate import Count as _Count

    counts = {}
    for blk in (
        ds.groupby(key_col)
        .aggregate(_Count(alias_name="_n"))
        .iter_batches(batch_format="pyarrow")
    ):
        for kv, nv in zip(blk[key_col].to_pylist(), blk["_n"].to_pylist()):
            counts[kv] = int(nv)
    quotas = {
        kv: int(math.floor(coeff * math.sqrt(float(nv))))
        for kv, nv in counts.items()
    }
    return quota_mix(ds, key_col=key_col, id_col=id_col, quotas=quotas)
