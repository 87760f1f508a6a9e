"""Adaptive recrawl scheduling — change-rate estimation over a window
of crawl snapshots, ranked frequency-greedy (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS 2003: the
refresh policy ranks pages by their estimated change frequency
lambda-hat = X/n, X observed changes over n observation intervals;
at a fixed window length n the ranking is the integer pair
(X, staleness), so the whole score stays exact integers and the DuckDB
oracle hash-matches bit-for-bit).

Reference tie-in: the reference refreshes unconditionally — every
refetch upserts by url (louis/db.py:494-528 ``ON CONFLICT (url) DO
UPDATE``) and nothing decides WHICH urls deserve a refetch first. This
stage is that missing scheduler: it consumes the same snapshot history
the upsert sink accumulates and emits the priority order a recrawl
round should fetch in, which rides ``CrawlConfig.priority_scores``
(the 'score_desc' frontier key, state/seen.py) unchanged.

Input: an observations Dataset with one row per (key, snapshot) —
``key_col`` (url), ``snap_col`` (0..n_snaps-1), and either a content
column (fingerprinted in-block here) or a precomputed int64
fingerprint column (``fp_col``) when the caller fused fingerprinting
into an upstream stage to avoid materializing snapshot payloads.

Scale shape: content is hashed to an int64 fingerprint INSIDE the map
task (payloads never shuffle), the per-row fingerprint is pivoted into
``n_snaps`` sparse columns, and ONE groupby(key) with null-ignoring
Min aggregates merges the window — the shuffle carries one row of
n_snaps int64s (mostly null) per observation. The classify pass is
stateless vectorized numpy. n_snaps is asserted small (a recrawl
window is a handful of revisits by nature) so the pivot never becomes
a wide-table problem.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

MAX_SNAPS = 64


def content_fp64(values: list) -> np.ndarray:
    """int64 md5 fingerprint of each content value (str or bytes).
    Collision probability ~2^-64 per pair — this is a fingerprint
    scheduler by construction, same trust model as the exact-dedup
    hash column."""
    md5 = hashlib.md5
    out = np.empty(len(values), np.int64)
    for i, v in enumerate(values):
        if v is None:
            v = b""
        elif isinstance(v, str):
            v = v.encode()
        out[i] = int.from_bytes(md5(v).digest()[:8], "big", signed=True)
    return out


def recrawl_priorities(
    obs: ray.data.Dataset,
    n_snaps: int,
    key_col: str = "url",
    snap_col: str = "snap",
    content_col: str = "content",
    fp_col: str | None = None,
) -> ray.data.Dataset:
    """Per-key change statistics and recrawl priority over an
    ``n_snaps``-snapshot window.

    A key "changed at t" iff it was observed at both t-1 and t and the
    fingerprints differ; observation gaps contribute no change (the
    estimator only counts intervals it actually saw, per the paper's
    X/n discipline). Emits one row per key:

      n_obs        snapshots the key was present in
      n_changes    observed consecutive-pair changes (X)
      last_changed latest t with a change, 0 if none
      staleness    (n_snaps-1) - last_changed  — intervals since the
                   last observed change
      present      observed in the final snapshot (recrawlable now)
      priority     n_changes * n_snaps + staleness — frequency-greedy,
                   staleness tie-break; exact int64

    Duplicate (key, snap) observations are merged by fingerprint Min —
    deterministic regardless of block layout."""
    if not 2 <= n_snaps <= MAX_SNAPS:
        raise ValueError(f"n_snaps must be in [2, {MAX_SNAPS}], got {n_snaps}")
    hcols = [f"__h{t}" for t in range(n_snaps)]

    def pivot(batch: pa.Table) -> pa.Table:
        snaps = batch[snap_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if fp_col is not None:
            fps = batch[fp_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            fps = content_fp64(batch[content_col].to_pylist())
        cols: dict = {key_col: batch[key_col]}
        for t in range(n_snaps):
            mask = snaps != t  # True = null (masked out)
            cols[hcols[t]] = pa.array(fps, pa.int64(), mask=mask)
        return pa.table(cols)

    merged = (
        obs.map_batches(pivot, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            *[Min(h, alias_name=h, ignore_nulls=True) for h in hcols]
        )
    )

    def classify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hs, present = [], []
        for h in hcols:
            # an all-null column (no key observed at t) aggregates to
            # null type — re-anchor to int64 before fill_null
            col = batch[h].combine_chunks().cast(pa.int64())
            present.append(pc.is_valid(col).to_numpy(zero_copy_only=False))
            hs.append(col.fill_null(0).to_numpy(zero_copy_only=False))
        n_obs = np.zeros(n, np.int64)
        for p in present:
            n_obs += p
        n_changes = np.zeros(n, np.int64)
        last_changed = np.zeros(n, np.int64)
        for t in range(1, n_snaps):
            chg = present[t] & present[t - 1] & (hs[t] != hs[t - 1])
            n_changes += chg
            last_changed = np.where(chg, t, last_changed)
        staleness = (n_snaps - 1) - last_changed
        return pa.table(
            {
                key_col: batch[key_col],
                "n_obs": pa.array(n_obs, pa.int64()),
                "n_changes": pa.array(n_changes, pa.int64()),
                "last_changed": pa.array(last_changed, pa.int64()),
                "staleness": pa.array(staleness, pa.int64()),
                "present": pa.array(present[n_snaps - 1]),
                "priority": pa.array(
                    n_changes * n_snaps + staleness, pa.int64()
                ),
            }
        )

    return merged.map_batches(classify, batch_format="pyarrow")


def freshness_metrics(
    obs: ray.data.Dataset,
    n_snaps: int,
    key_col: str = "url",
    snap_col: str = "snap",
    content_col: str = "content",
    refresh_col: str = "refresh_snap",
    fp_col: str | None = None,
) -> ray.data.Dataset:
    """Index freshness & age at the final snapshot T = n_snaps-1 (Cho
    & Garcia-Molina 2003, "Effective Page Refresh Policies for Web
    Crawlers"): each key's INDEX COPY is the content observed at its
    refresh snapshot r (``refresh_col``, constant per key); the copy
    is FRESH iff no later observed snapshot's fingerprint differs from
    it, and its AGE is T - t_c, t_c = first differing snapshot after r
    (age counts full snapshot intervals stale; a change AT T gives
    age 0 with fresh = False). Emits (key, refresh_snap, fresh, age).

    Same scale shape as :func:`recrawl_priorities`: fingerprints are
    computed inside the map task (payloads never shuffle), pivoted
    into per-snapshot columns, merged with ONE groupby(key); the
    classification is vectorized numpy over the merged rows. Keys must
    be observed at their refresh snapshot."""
    if not 2 <= n_snaps <= MAX_SNAPS:
        raise ValueError(f"n_snaps must be in [2, {MAX_SNAPS}], got {n_snaps}")
    hcols = [f"__h{t}" for t in range(n_snaps)]
    T = n_snaps - 1

    def pivot(batch: pa.Table) -> pa.Table:
        snaps = batch[snap_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if fp_col is not None:
            fps = batch[fp_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            fps = content_fp64(batch[content_col].to_pylist())
        cols: dict = {
            key_col: batch[key_col],
            refresh_col: batch[refresh_col].cast(pa.int64()),
        }
        for t in range(n_snaps):
            mask = snaps != t
            cols[hcols[t]] = pa.array(fps, pa.int64(), mask=mask)
        return pa.table(cols)

    merged = (
        obs.map_batches(pivot, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Min(refresh_col, alias_name=refresh_col),
            *[Min(h, alias_name=h, ignore_nulls=True) for h in hcols],
        )
    )

    def classify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hs, present = [], []
        for h in hcols:
            col = batch[h].combine_chunks().cast(pa.int64())
            present.append(pc.is_valid(col).to_numpy(zero_copy_only=False))
            hs.append(col.fill_null(0).to_numpy(zero_copy_only=False))
        r = (
            batch[refresh_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        H = np.stack(hs)  # (n_snaps, n)
        copy = H[r, np.arange(n)]
        t_c = np.full(n, n_snaps, np.int64)  # sentinel: never went stale
        for t in range(1, n_snaps):
            diff = present[t] & (H[t] != copy) & (t > r) & (t_c == n_snaps)
            t_c[diff] = t
        fresh = t_c == n_snaps
        age = np.where(fresh, 0, T - t_c)
        return pa.table(
            {
                key_col: batch[key_col],
                refresh_col: pa.array(r, pa.int64()),
                "fresh": pa.array(fresh, pa.bool_()),
                "age": pa.array(age, pa.int64()),
            }
        )

    return merged.map_batches(classify, batch_format="pyarrow")


def change_rate_classes(
    obs: ray.data.Dataset,
    n_snaps: int,
    key_col: str = "url",
    snap_col: str = "snap",
    content_col: str = "content",
    fp_col: str | None = None,
) -> ray.data.Dataset:
    """Cho & Garcia-Molina change-FREQUENCY estimation ("Estimating
    Frequency of Change", TOIT 2003): per key, the bias-reduced
    Poisson-rate estimator lambda-hat = -ln r-hat with survival ratio
    r-hat = (n - X + 0.5) / (n + 0.5), where n counts OBSERVED
    consecutive-snapshot intervals and X the changes seen in them.

    The revisit class is the estimator bucketed at
    lambda-hat in {ln(4/3), ln 2, ln 4} — but because -ln is monotone,
    the buckets are decided by EXACT integer cross-multiplications on
    the rational r-hat = (2(n-X)+1)/(2n+1) against 3/4, 1/2, 1/4, so
    the engine and the DuckDB oracle agree bit-for-bit with no
    transcendental function evaluated anywhere:

      class 3 (hot,  lambda >= ln4):    4*(2(n-X)+1) <=     2n+1
      class 2 (warm, lambda >= ln2):    2*(2(n-X)+1) <=     2n+1
      class 1 (cool, lambda >= ln4/3):  4*(2(n-X)+1) <= 3*(2n+1)
      class 0 (cold) otherwise

    revisit_rounds = 2^(3 - class) — hot pages repoll every round,
    cold every 8th: the proportional-to-rate schedule the paper shows
    beats uniform revisiting. Same scale shape as recrawl_priorities:
    fingerprints never leave the map task, one groupby(key) merges the
    window, classification is stateless vectorized numpy."""
    if not 2 <= n_snaps <= MAX_SNAPS:
        raise ValueError(f"n_snaps must be in [2, {MAX_SNAPS}], got {n_snaps}")
    hcols = [f"__h{t}" for t in range(n_snaps)]

    def pivot(batch: pa.Table) -> pa.Table:
        snaps = batch[snap_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if fp_col is not None:
            fps = batch[fp_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            fps = content_fp64(batch[content_col].to_pylist())
        cols: dict = {key_col: batch[key_col]}
        for t in range(n_snaps):
            mask = snaps != t
            cols[hcols[t]] = pa.array(fps, pa.int64(), mask=mask)
        return pa.table(cols)

    merged = (
        obs.map_batches(pivot, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Min(h, alias_name=h, ignore_nulls=True) for h in hcols])
    )

    def classify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hs, present = [], []
        for h in hcols:
            col = batch[h].combine_chunks().cast(pa.int64())
            present.append(pc.is_valid(col).to_numpy(zero_copy_only=False))
            hs.append(col.fill_null(0).to_numpy(zero_copy_only=False))
        n_int = np.zeros(n, np.int64)
        x_chg = np.zeros(n, np.int64)
        for t in range(1, n_snaps):
            pair = present[t] & present[t - 1]
            n_int += pair
            x_chg += pair & (hs[t] != hs[t - 1])
        # exact rational bucketing of r-hat = (2(n-X)+1) / (2n+1)
        num = 2 * (n_int - x_chg) + 1
        den = 2 * n_int + 1
        cls = np.zeros(n, np.int64)
        cls = np.where(4 * num <= 3 * den, 1, cls)
        cls = np.where(2 * num <= den, 2, cls)
        cls = np.where(4 * num <= den, 3, cls)
        return pa.table(
            {
                key_col: batch[key_col],
                "n_intervals": pa.array(n_int, pa.int64()),
                "x_changes": pa.array(x_chg, pa.int64()),
                "freq_class": pa.array(cls, pa.int64()),
                "revisit_rounds": pa.array(
                    np.int64(1) << (3 - cls), pa.int64()
                ),
            }
        )

    return merged.map_batches(classify, batch_format="pyarrow")
