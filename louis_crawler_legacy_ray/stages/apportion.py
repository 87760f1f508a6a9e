"""Crawl-budget apportionment across hosts — the largest-remainder
(Hare-quota) method, exact integers end to end.

A polite crawler schedules a fixed fetch budget B per cycle and must
split it across hosts proportionally to how much of the frontier each
host holds. Proportional shares ``B*n_h/N`` aren't integers; the
largest-remainder method takes ``floor(B*n_h/N)`` per host and hands
the leftover ``R = B - sum(floors)`` one-by-one to the hosts with the
largest remainders ``(B*n_h) mod N`` — the unique apportionment with
every host within 1 of its exact share (no float enters, so the DuckDB
oracle hash-matches bit-for-bit).

Reference tie-in: the reference's per-host budget is a static
AutoThrottle target (settings.py:71-80 — same ceiling for every host
regardless of how much of the crawl lives there); this stage computes
the frontier-proportional split its parallel spider never had.

Scale shape: the host-count table is dimension-sized but NOT
driver-sized at 10^10 URLs (~10^8 hosts), so the remainder ranking is
distributed: per-block floor/rem columns (int64 with a proven
``B*max(n) < 2^63`` bound per block, arbitrary-precision Python-int
fallback above it), two scalar aggregates (N, then sum of remainders —
``R = sum(rem)/N`` exactly, saving a third pass), and ONE
``stages/scan.py`` prefix rank over (rem DESC, key ASC) order — driver
state stays O(scan buckets). The +1 assignment is a stateless
comparison of the exclusive rank against R.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .scan import prefix_sum, range_bucket


def apportion_budgets(
    counts: ray.data.Dataset,
    total_budget: int,
    key_col: str = "host",
    n_col: str = "n",
) -> ray.data.Dataset:
    """Split ``total_budget`` across the keys of a (key, n) count table
    by largest remainder. Returns (key, n, budget) with
    ``sum(budget) == total_budget`` and every budget within 1 of the
    exact proportional share. Deterministic tie-break: equal
    remainders rank by key ascending."""
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    b = int(total_budget)
    n_total = counts.aggregate(Sum(n_col, alias_name="s"))["s"]
    if not n_total:
        return counts.map_batches(
            lambda t: pa.table(
                {
                    key_col: t[key_col],
                    "n": t[n_col].cast(pa.int64()),
                    "budget": pa.array([0] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    n_total = int(n_total)

    def quota(t: pa.Table) -> pa.Table:
        ns = t[n_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mx = int(ns.max()) if len(ns) else 0
        if b * mx < 2**63:
            prod = ns * np.int64(b)
            fl = prod // n_total
            rem = prod % n_total
        else:
            # arbitrary-precision route (B x n overflows int64): the
            # REMAINDER is < N so it still lands in int64; the floor
            # may not — apportionment with a floor beyond int64 means
            # a per-host budget over 9e18 fetches, so raise loudly
            fls, rems = [], []
            for v in ns.tolist():
                q, r = divmod(b * int(v), n_total)
                fls.append(q)
                rems.append(r)
            fl = np.array(fls, np.int64)
            rem = np.array(rems, np.int64)
        return pa.table(
            {
                key_col: t[key_col],
                "n": pa.array(ns, pa.int64()),
                "floor_q": pa.array(fl, pa.int64()),
                "rem": pa.array(rem, pa.int64()),
                # order-inverted remainder so ascending scan order is
                # descending-remainder (scan buckets must be
                # order-preserving ascending)
                "neg_rem": pa.array(n_total - 1 - rem, pa.int64()),
                "one": pa.array(np.ones(len(ns), np.int64)),
            }
        )

    q = counts.map_batches(quota, batch_format="pyarrow")
    # R = B - sum(floors) == sum(remainders) / N (exact): one aggregate
    # instead of a second full pass over the floors
    rem_sum = int(q.aggregate(Sum("rem", alias_name="s"))["s"] or 0)
    leftover = rem_sum // n_total

    width = max(1, n_total // 4096)
    ranked = prefix_sum(
        q,
        order_cols=["neg_rem", key_col],
        val_col="one",
        bucket_fn=range_bucket("neg_rem", width),
        out_excl="rank_excl",
        out_incl="_rank_incl",
    )

    def assign(t: pa.Table) -> pa.Table:
        bonus = (
            t["rank_excl"].to_numpy(zero_copy_only=False) < leftover
        ).astype(np.int64)
        budget = t["floor_q"].to_numpy(zero_copy_only=False) + bonus
        return pa.table(
            {
                key_col: t[key_col],
                "n": t["n"],
                "budget": pa.array(budget, pa.int64()),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow")
