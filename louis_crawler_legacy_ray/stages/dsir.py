"""Data Selection via Importance Resampling (DSIR) — hashed-n-gram
importance weighting of a raw corpus toward a target distribution
(Xie et al., NeurIPS 2023, "Data Selection for Language Models via
Importance Resampling").

The published estimator scores each raw document by
``sum_f c_doc(f) * (log p_target(f) - log p_raw(f))`` over hashed
unigram+bigram features f. This module implements two variants:

- ``mode="exact_int"`` (the oracled default): the per-feature weight is
  the EXACT-INTEGER cross-multiplication ``n_t(f)*R - n_r(f)*T`` (the
  sign/magnitude of ``p_t(f)/T' - p_r(f)/R'`` scaled by T*R), the same
  integer-ratio discipline the repo's ``gopher_quality`` uses so a
  DuckDB oracle hash-matches bit-for-bit. Monotone in the linearized
  log-ratio around equal distributions; no float enters the pipeline.
- ``mode="log"`` (the 100 TB path): the published smoothed log-ratio
  ``ln((n_t+1)*(R+B)) - ln((n_r+1)*(T+B))`` in doubles — unbounded
  corpus sizes never overflow, at the cost of float summation order
  (so: rows-only/pytest verification, not a hash oracle).

Scale shape (both modes): one combiner-pruned pass builds the
B=``n_buckets``-row feature-count table (per-block int64 histogram
partials -> ONE groupby over at most B keys), the driver folds B rows,
the weight vector is broadcast ONCE via ``ray.put`` (decontaminate's
benchmark-gram pattern), and the scoring pass is stateless
``map_batches`` with a per-block top-k combiner so the final sort+limit
sees at most k rows per block. Nothing proportional to the corpus ever
reaches the driver.

Reference inventory tie-in: the reference has no selection stage at
all (its pipeline keeps every crawled page, louis/crawler/pipelines.py
stores unconditionally); DSIR extends the engine per the task brief's
training-data operator list.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

_WORD_RE = re.compile(r"[a-z0-9]+")

DSIR_BUCKETS = 1024


def _md5_u64_lower(s: str) -> int:
    """DuckDB md5_number_lower parity: little-endian uint64 of the
    digest's LAST 8 bytes (same helper as stages/dedup.py's md5
    companion family)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def _doc_buckets(text: str, n_buckets: int) -> list[int]:
    """Hashed unigram+bigram feature-instance buckets of one document
    (one entry PER OCCURRENCE — the estimator weighs by count)."""
    ws = _WORD_RE.findall((text or "").lower())
    bs = [_md5_u64_lower(w) % n_buckets for w in ws]
    bs += [
        _md5_u64_lower(a + " " + b) % n_buckets for a, b in zip(ws, ws[1:])
    ]
    return bs


def feature_count_partial(
    batch: pa.Table,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> pa.Table:
    """Per-block histogram partial: (bucket, n_t, n_r) over the block's
    feature instances — at most ``n_buckets`` rows per block regardless
    of block size, so the groupby that follows shuffles O(blocks x B)
    tiny rows."""
    nt = np.zeros(n_buckets, np.int64)
    nr = np.zeros(n_buckets, np.int64)
    for tgt, t in zip(
        batch[target_col].to_pylist(), batch[text_col].to_pylist()
    ):
        bs = _doc_buckets(t, n_buckets)
        if not bs:
            continue
        arr = np.asarray(bs, np.int64)
        np.add.at(nr, arr, 1)
        if tgt == target_val:
            np.add.at(nt, arr, 1)
    nz = np.flatnonzero(nr)
    return pa.table(
        {
            "bucket": pa.array(nz, pa.int64()),
            "n_t": pa.array(nt[nz], pa.int64()),
            "n_r": pa.array(nr[nz], pa.int64()),
        }
    )


def dsir_weights(
    docs: ray.data.Dataset,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    mode: str = "exact_int",
):
    """Build the per-bucket importance-weight vector and broadcast it.

    Returns ``(weight_ref, exact)`` where ``weight_ref`` is a plasma ref
    to either an int64 numpy vector (exact_int, when the magnitude
    bound proves int64-safe), a Python-int list (exact_int, unbounded
    fallback), or a float64 vector (log mode / overflow route)."""
    counts = (
        docs.map_batches(
            lambda b: feature_count_partial(
                b, target_col, target_val, text_col, n_buckets
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Sum("n_t", alias_name="n_t"), Sum("n_r", alias_name="n_r"))
    )
    nt = [0] * n_buckets  # Python ints: exact at any corpus size
    nr = [0] * n_buckets
    for row in counts.iter_rows():  # <= n_buckets rows: bounded driver fold
        nt[int(row["bucket"])] = int(row["n_t"])
        nr[int(row["bucket"])] = int(row["n_r"])
    t_tot, r_tot = sum(nt), sum(nr)
    if mode == "exact_int":
        w = [a * r_tot - b * t_tot for a, b in zip(nt, nr)]
        return ray.put(w), True
    import math

    wf = np.array(
        [
            math.log((a + 1) * (r_tot + n_buckets))
            - math.log((b + 1) * (t_tot + n_buckets))
            for a, b in zip(nt, nr)
        ],
        np.float64,
    )
    return ray.put(wf), False


class DsirScorer:
    """Actor-pool scoring stage: per-doc importance score = sum over
    the doc's feature INSTANCES of the bucket weight. Weight vector is
    fetched from plasma once per actor (never re-shipped per batch).

    exact_int scores vectorize through int64 when the proven bound
    ``max|w| * instances_per_doc < 2**63`` holds for the block, else
    fall back to exact Python-int summation (the oracle stays exact
    either way). Docs with zero features emit nothing (mirrors the SQL
    oracle, whose per-doc groupby never sees them)."""

    def __init__(self, weight_ref, exact: bool, text_col: str = "text",
                 n_buckets: int = DSIR_BUCKETS):
        w = ray.get(weight_ref)
        self.exact = exact
        self.text_col = text_col
        self.n_buckets = n_buckets
        if exact:
            self.w_list = list(w)
            self.w_absmax = max((abs(x) for x in w), default=0)
            self.w_i64 = (
                np.array(w, np.int64)
                if all(abs(x) < 2**63 for x in w)
                else None
            )
        else:
            self.w_f64 = np.asarray(w, np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, scores = [], []
        for doc_id, t in zip(
            batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()
        ):
            bs = _doc_buckets(t, self.n_buckets)
            if not bs:
                continue
            ids.append(doc_id)
            if not self.exact:
                scores.append(float(self.w_f64[np.asarray(bs, np.int64)].sum()))
            elif (
                self.w_i64 is not None
                and self.w_absmax * len(bs) < 2**63
            ):
                scores.append(int(self.w_i64[np.asarray(bs, np.int64)].sum()))
            else:
                scores.append(sum(self.w_list[b] for b in bs))
        if self.exact:
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "score": pa.array(scores, pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def dsir_topk(
    docs: ray.data.Dataset,
    k: int = 100,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    mode: str = "exact_int",
) -> ray.data.Dataset:
    """Top-k most-target-like documents by DSIR importance score
    (deterministic tie-break: score DESC, doc_id ASC). Per-block top-k
    combiner first, so the global sort ranks at most k rows per block."""
    ref, exact = dsir_weights(
        docs, target_col, target_val, text_col, n_buckets, mode
    )
    scored = docs.map_batches(
        DsirScorer,
        fn_constructor_args=(ref, exact, text_col, n_buckets),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        order = pc.sort_indices(
            b,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        return b.take(order[:k])

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
