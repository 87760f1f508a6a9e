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

Scale shape (both modes): the count pass emits ONE 2B-int64 histogram
blob per block (B=``n_buckets``) and a fan-in task tree
(stages/fold.py) merges them — no groupby, depth O(log blocks), one
16 KB blob on the driver. The weight vector is broadcast ONCE via
``ray.put`` (decontaminate's benchmark-gram pattern), the scoring pass
is stateless ``map_batches`` with a per-block top-k combiner, and the
global top-k is a single-block merge over at most k rows per block —
no distributed Sort. Per-gram md5 hashes are memoized per worker
process (the Zipf head re-hashes for free across batches). Nothing
proportional to the corpus ever reaches the driver.

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

_WORD_RE = re.compile(r"[a-z0-9]+")

DSIR_BUCKETS = 1024

# gram -> raw md5 u64 (pre-modulo, so one cache serves any n_buckets);
# per worker process, cleared at the cap so a pathological vocabulary
# can't grow the heap unboundedly.
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_CAP = 1 << 21


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


def _block_instances(
    texts: list, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a block of documents once: returns ``(buckets,
    counts)`` where ``buckets`` is the int64 bucket id of every feature
    instance (docs concatenated in order) and ``counts[i]`` is doc i's
    instance count. md5 is memoized per distinct gram."""
    cache = _HASH_CACHE
    if len(cache) > _HASH_CACHE_CAP:
        cache.clear()
    counts = np.empty(len(texts), np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        ws = _WORD_RE.findall((t or "").lower())
        n0 = len(flat)
        flat.extend(ws)
        flat.extend([a + " " + b for a, b in zip(ws, ws[1:])])
        counts[i] = len(flat) - n0
    if not flat:
        return np.empty(0, np.int64), counts
    u64 = np.empty(len(flat), np.uint64)
    get = cache.get
    md5 = hashlib.md5
    for i, g in enumerate(flat):
        v = get(g)
        if v is None:
            v = int.from_bytes(md5(g.encode()).digest()[8:16], "little")
            cache[g] = v
        u64[i] = v
    return (u64 % np.uint64(n_buckets)).astype(np.int64), counts


def feature_count_partial(
    batch: pa.Table,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> pa.Table:
    """Per-block histogram partial as ONE mergeable blob row:
    ``int64[2B]`` = ``n_t`` then ``n_r`` counts over the block's
    feature instances — 16 KB per block regardless of block size, so
    the fan-in tree that follows moves O(blocks) tiny blobs."""
    buckets, counts = _block_instances(batch[text_col].to_pylist(), n_buckets)
    nr = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
    is_t = (
        pc.fill_null(pc.equal(batch[target_col], pa.scalar(target_val)), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    nt = np.bincount(
        buckets[np.repeat(is_t, counts)], minlength=n_buckets
    ).astype(np.int64)
    return pa.table({"blob": pa.array([np.concatenate([nt, nr]).tobytes()])})


def _merge_count_blobs(blobs: list[bytes]) -> bytes:
    """Associative+commutative int64 vector sum — the tree-fold merge.
    Identity element: the empty bytes."""
    blobs = [b for b in blobs if b]
    if not blobs:
        return b""
    acc = np.frombuffer(blobs[0], np.int64).copy()
    for b in blobs[1:]:
        acc += np.frombuffer(b, np.int64)
    return acc.tobytes()


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
    to either a Python-int list (exact_int — the cross-multiplication
    ``n_t*R - n_r*T`` can exceed int64 once the corpus holds >3e9
    feature instances, so the weights stay arbitrary-precision; the
    scorer re-narrows to int64 when a proven bound allows) or a float64
    vector (log mode)."""
    from .fold import tree_fold_blobs

    partials = docs.map_batches(
        lambda b: feature_count_partial(
            b, target_col, target_val, text_col, n_buckets
        ),
        batch_format="pyarrow",
    )
    blob = tree_fold_blobs(partials, "blob", _merge_count_blobs)
    if blob:
        arr = np.frombuffer(blob, np.int64)
        # int64 partials are exact here: overflowing a count would need
        # 2^63 feature instances (~9 ZB of text)
        nt = arr[:n_buckets].tolist()
        nr = arr[n_buckets:].tolist()
    else:
        nt = [0] * n_buckets
        nr = [0] * n_buckets
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

    exact_int scores vectorize through int64 segment sums
    (``np.add.at`` over the block's concatenated instances) when the
    proven bound ``max|w| * max_instances_per_doc < 2**63`` holds for
    the block — every partial sum is bounded by that product, so no
    intermediate wraps — else fall back to exact Python-int summation
    (the oracle stays exact either way). Docs with zero features emit
    nothing (mirrors the SQL oracle, whose per-doc groupby never sees
    them)."""

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
        buckets, counts = _block_instances(
            batch[self.text_col].to_pylist(), self.n_buckets
        )
        keep = counts > 0
        ids = pc.take(
            batch["doc_id"], pa.array(np.flatnonzero(keep), pa.int64())
        )
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        max_cnt = int(counts.max()) if len(counts) else 0
        if not self.exact:
            sums = np.zeros(len(counts), np.float64)
            np.add.at(sums, doc_idx, self.w_f64[buckets])
            return pa.table(
                {"doc_id": ids, "score": pa.array(sums[keep], pa.float64())}
            )
        if self.w_i64 is not None and self.w_absmax * max_cnt < 2**63:
            sums = np.zeros(len(counts), np.int64)
            np.add.at(sums, doc_idx, self.w_i64[buckets])
            scores = pa.array(sums[keep], pa.int64())
        else:
            # arbitrary-precision route: per-doc Python-int sums;
            # pa.array raises loudly if a score exceeds int64
            bl = buckets.tolist()
            offs = np.concatenate([[0], np.cumsum(counts)]).tolist()
            w = self.w_list
            scores = pa.array(
                [
                    sum(w[b] for b in bl[offs[i] : offs[i + 1]])
                    for i in np.flatnonzero(keep)
                ],
                pa.int64(),
            )
        return pa.table({"doc_id": ids, "score": scores})


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
    combiner first, so the single-block merge that replaces a
    distributed Sort sees at most k rows per block (k x blocks rows
    through one funnel task — at k=100 that stays < 2 GB out past a
    million blocks; insert a second combiner tier before the funnel if
    block counts ever exceed that)."""
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

    def final_topk(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        return b.take(order[: min(k, b.num_rows)])

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )
