"""Mergeable sketches (ray_guide "Aggregation at scale"): one sketch
per batch inside map_batches, merged in a tiny second stage — the
pattern that replaces an all-to-all `unique`/`groupby` at 100 TB.

HyperLogLog here (approx distinct count, standard error ~1.04/sqrt(m));
the serialization contract (one binary register blob per batch row)
is what any other sketch (KLL, theta, CountMin) would reuse.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        nonzero = rest != 0
        lz = np.full(len(hashes), 64 - self.p, dtype=np.int64)
        # leading zeros via bit_length: 64 - bit_length(rest)
        bl = np.zeros(len(hashes), dtype=np.int64)
        r = rest[nonzero]
        out = np.zeros(len(r), dtype=np.int64)
        v = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v >= (np.uint64(1) << np.uint64(shift))
            out[mask] += shift
            v[mask] >>= np.uint64(shift)
        bl[nonzero] = out + 1
        lz[nonzero] = 64 - bl[nonzero]
        rank = np.minimum(lz + 1, 64 - self.p + 1)
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def _hash64_col(values: list) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
            )
            for v in values
        ],
        dtype=np.uint64,
    )


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> dict:
    """Approximate COUNT(DISTINCT col): one HLL per batch, merged on
    the driver (sketch blobs are ~4 KB each — the merge is trivial
    regardless of data size). Returns {"estimate", "p"}."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash64_col(batch[col].to_pylist()))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HLL(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_rows():
        merged.merge(HLL.from_bytes(row["sketch"], p))
    return {"estimate": merged.estimate(), "p": p}


def histogram_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: list[float],
) -> ray.data.Dataset:
    """EXACT distributed discrete quantiles per key via a value
    histogram: each block pre-aggregates (key, value) -> count, one
    groupby merges the histograms, and a per-key walk picks the element
    at 0-based rank floor((n-1)*q) — DuckDB ``quantile_disc``
    semantics, so the result is oracle-checkable (unlike mergeable
    approximate sketches).

    Scale assumption (documented): the number of DISTINCT values per
    key bounds the per-key group, not the row count — right for
    discretized/monotone-mapped values (cents, sizes, scores); for
    unbounded continuous domains use a t-digest-style sketch instead."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        df = (
            b.select([key_col, value_col])
            .to_pandas()
            .groupby([key_col, value_col], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        cum = g["n"].cumsum().to_numpy()
        tot = int(cum[-1])
        vals = g[value_col].to_numpy()
        out_q, out_v = [], []
        for q in qs:
            # DuckDB quantile_disc: 1-based rank ceil(n*q) (probed
            # across n=2..13; exact for binary-fraction q)
            rank = max(1, math.ceil(tot * q))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_q.append(int(round(q * 100)))
            out_v.append(vals[idx])
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]] * len(qs),
                "q_pct": out_q,
                value_col: out_v,
            }
        )

    return hist.groupby(key_col).map_groups(walk, batch_format="pandas")
