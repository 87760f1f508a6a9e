"""Similarity search over an embedding column (list<float>).

* :func:`brute_force_topk` — the exact baseline: per-batch numpy matmul
  of the corpus against a broadcast query matrix, partial top-k per
  batch, tiny driver-side merge of the partials (k x n_queries rows,
  never the corpus). One corpus scan, no shuffle.
* :class:`LSHIndexStage` / :func:`lsh_topk` — a scale path: random-
  hyperplane LSH buckets; queries probe their own bucket plus hamming-1
  neighbors. Approximate (recall tested against the brute-force
  baseline, not an oracle).
* :func:`ivf_topk` — the other scale path: an IVF coarse quantizer.
  Spherical k-means centroids are trained on a bounded driver-side
  sample (dimension-sized state), broadcast once; one corpus pass
  assigns each vector to its nearest centroid and keeps only vectors
  in the union of the queries' ``nprobe`` closest lists; exact cosine
  top-k runs on that candidate subset. Probed fraction ~ nprobe /
  n_lists of the corpus, no shuffle.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray.data

from . import pool_size


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k. Returns (query_id, rank, vec_id, cosine)
    with rank 1..k by (cosine desc, vec_id asc) — the deterministic
    tie-break the SQL oracle reproduces."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        sims = qn @ vecs.T  # (n_q, n_batch)
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if len(row) > k:
                idx = np.argpartition(-row, k)[:k]
            else:
                idx = np.arange(len(row))
            out_q.extend([query_ids[qi]] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_sim.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    # merge partials per query (tiny: n_partial_batches * k rows)
    best: dict[int, list] = {}
    for r in partials:
        # heap on (cosine, -vec_id) so ties prefer the SMALLER vec_id
        heapq.heappush(
            best.setdefault(r["query_id"], []), (r["cosine"], -r["vec_id"])
        )
        if len(best[r["query_id"]]) > k:
            heapq.heappop(best[r["query_id"]])
    q_out, rank_out, id_out, sim_out = [], [], [], []
    for q in sorted(best):
        items = sorted(best[q], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, negid) in enumerate(items, 1):
            q_out.append(q)
            rank_out.append(rank)
            id_out.append(-negid)
            sim_out.append(sim)
    return pa.table(
        {
            "query_id": pa.array(q_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "cosine": pa.array(sim_out, pa.float64()),
        }
    )


class LSHIndexStage:
    """Random-hyperplane signature stage: adds a ``bucket`` column
    (int64 of the sign-bit signature). Hyperplanes are generated from a
    fixed seed in __init__ — once per actor."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(vecs), pa.int64())
        )


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
) -> pa.Table:
    """Approximate top-k: probe each query's bucket and its hamming-1
    neighbors only. Corpus is bucketed once (one pass); probing filters
    to ~ (n_planes+1)/2^n_planes of the corpus."""
    stage = LSHIndexStage(dim, n_planes, seed)
    qn = np.asarray(queries, dtype=np.float64)
    qbuckets = stage.bucket_of(qn)
    probe: set[int] = set()
    for qb in qbuckets:
        probe.add(int(qb))
        for p in range(n_planes):
            probe.add(int(qb) ^ (1 << p))

    bucketed = ds.map_batches(
        LSHIndexStage,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed},
        batch_format="pyarrow",
        concurrency=pool_size(),
    )
    probe_arr = pa.array(sorted(probe), pa.int64())
    cand = bucketed.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["bucket"], value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return brute_force_topk(cand, queries, query_ids, k=k)


def kmeans_fit(
    sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Spherical k-means on a (bounded) sample — the IVF coarse
    quantizer. Deterministic: seeded init from sample rows; empty lists
    keep their previous centroid. Returns unit-norm (n_lists, dim)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(sample)
    centroids = sample[rng.choice(n, size=min(n_lists, n), replace=False)]
    if len(centroids) < n_lists:
        centroids = np.vstack(
            [centroids, rng.normal(size=(n_lists - len(centroids), sample.shape[1]))]
        )
    centroids = _normalize(centroids)
    for _ in range(iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate cosine top-k via an IVF index: train the coarse
    quantizer on a bounded sample, then ONE corpus pass filters to the
    union of every query's nprobe nearest lists (assignment computed
    inside the task against the broadcast centroid matrix — no
    shuffle, no per-vector state), and the exact kernel ranks the
    candidates."""
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    centroids = kmeans_fit(sample, n_lists, seed=seed)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsims = qn @ centroids.T
    nprobe = min(nprobe, n_lists)
    probe_lists = np.unique(
        np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
    ).astype(np.int64)
    probe_set = pa.array(probe_lists.tolist(), pa.int64())

    def assign_filter(batch: pa.Table) -> pa.Table:
        vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        lists = (vecs @ centroids.T).argmax(axis=1).astype(np.int64)
        keep = pa.compute.is_in(pa.array(lists, pa.int64()), value_set=probe_set)
        return batch.filter(keep)

    cand = ds.map_batches(assign_filter, batch_format="pyarrow")
    return brute_force_topk(cand, queries, query_ids, k=k, id_col=id_col, vec_col=vec_col)


# ------------------------------------------------------ int8 quantization
def _minmax_merge(blobs: list[bytes]) -> bytes:
    """Tree-fold merge for per-block (lo, hi) calibration partials:
    each blob is float64 lo‖hi (D inferred from length); elementwise
    min/max is associative + commutative, so fold order is free."""
    los, his = [], []
    for bl in blobs:
        if not bl:
            continue
        arr = np.frombuffer(bl, dtype=np.float64)
        d = arr.size // 2
        los.append(arr[:d])
        his.append(arr[d:])
    if not los:
        return b""
    return np.concatenate(
        [np.min(los, axis=0), np.max(his, axis=0)]
    ).tobytes()


def embedding_scale(
    ds: ray.data.Dataset, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global (min, max) of an embedding column in ONE
    distributed pass: each block reduces to a 2 x D float64 blob and
    the blobs fold through the stages/fold.py task tree (O(log
    blocks) depth; the r4 iter_rows fold was O(blocks) sequential
    object-store reads through the driver). Only D-sized partials
    ever move; the driver touches one root blob."""
    from .fold import tree_fold_blobs

    def partial(batch: pa.Table) -> pa.Table:
        v = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if v.size == 0:
            return pa.table({"mm": pa.array([], pa.binary())})
        blob = np.concatenate([v.min(axis=0), v.max(axis=0)]).tobytes()
        return pa.table({"mm": pa.array([blob], pa.binary())})

    root = tree_fold_blobs(
        ds.map_batches(partial, batch_format="pyarrow"), "mm", _minmax_merge
    )
    if not root:
        return None, None
    arr = np.frombuffer(root, dtype=np.float64)
    d = arr.size // 2
    return arr[:d].copy(), arr[d:].copy()


def quantize_embeddings(
    ds: ray.data.Dataset,
    lo: np.ndarray,
    hi: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Scalar int8 quantization against broadcast per-dim (lo, hi):
    code = round((v - lo) / (hi - lo) * 255) - 128. 4x less object
    store and network than float32 (8x vs float64) for ANN at corpus
    scale; max per-dim dequantization error is half a step,
    (hi - lo) / 510. The (lo, hi) vectors are D floats — trivially
    broadcast in the closure."""
    span = np.where(hi > lo, hi - lo, 1.0)

    def q(batch: pa.Table) -> pa.Table:
        v = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        codes = np.clip(np.rint((v - lo) / span * 255.0), 0, 255) - 128
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "codes": pa.array(
                    codes.astype(np.int8).tolist(), pa.list_(pa.int8())
                ),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


def topk_quantized(
    qds: ray.data.Dataset,
    lo: np.ndarray,
    hi: np.ndarray,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Brute-force cosine top-k over int8 codes: per batch, dequantize
    (codes + 128) / 255 * span + lo in numpy and matmul against the
    broadcast query matrix — same partial-top-k merge as
    brute_force_topk, an eighth of the bytes through the object
    store."""
    span = np.where(hi > lo, hi - lo, 1.0)
    qn = _normalize(np.asarray(queries, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        codes = np.array(batch["codes"].to_pylist(), dtype=np.float64)
        vecs = _normalize((codes + 128.0) / 255.0 * span + lo)
        sims = qn @ vecs.T
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = (
                np.argpartition(-row, k)[:k]
                if len(row) > k
                else np.arange(len(row))
            )
            out_q.extend([query_ids[qi]] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_sim.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    parts = qds.map_batches(partial, batch_format="pyarrow")
    import pandas as pd

    df = parts.to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id", "cosine"]], preserve_index=False
    ).replace_schema_metadata(None)


# ------------------------------------------------------ product quantization
def pq_fit(
    sample: np.ndarray,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks (Jégou/Douze/Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): split the D
    dims into m_sub contiguous blocks and run Lloyd's independently in
    each. Trains on a bounded sample of L2-NORMALIZED vectors so the
    PQ-approximate inner product estimates cosine. Deterministic
    (seeded init from sample rows; empty cells keep their previous
    centroid). Returns (m_sub, n_codes, D // m_sub)."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    w = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.zeros((m_sub, n_codes, w))
    for m in range(m_sub):
        sub = X[:, m * w : (m + 1) * w]
        c = sub[rng.choice(n, size=min(n_codes, n), replace=False)].copy()
        if len(c) < n_codes:
            c = np.vstack([c, rng.normal(size=(n_codes - len(c), w))])
        for _ in range(iters):
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * (sub @ c.T)
                + (c**2).sum(1)[None, :]
            )
            a = d2.argmin(axis=1)
            for j in range(n_codes):
                mem = sub[a == j]
                if len(mem):
                    c[j] = mem.mean(axis=0)
        books[m] = c
    return books


def pq_encode(
    ds: ray.data.Dataset,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """ONE corpus pass: normalize, per-subspace nearest-codeword argmin
    (vectorized ||x||² - 2x·c + ||c||²) → uint8 codes. D floats become
    m_sub BYTES per vector — at 100 TB the index that has to live hot
    is 64x smaller than the float32 corpus. Codebooks are
    dimension-sized and ride the task closure once."""
    m_sub, _, w = books.shape
    books_sq = (books**2).sum(axis=2)  # (m_sub, n_codes)

    def enc(batch: pa.Table) -> pa.Table:
        vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        codes = np.empty((len(vecs), m_sub), dtype=np.uint8)
        for m in range(m_sub):
            sub = vecs[:, m * w : (m + 1) * w]
            d2 = -2.0 * (sub @ books[m].T) + books_sq[m][None, :]
            codes[:, m] = d2.argmin(axis=1)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "pq_codes": pa.array(codes.tolist(), pa.list_(pa.uint8())),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 16,
    train_sample: int = 2048,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate cosine top-k by asymmetric distance computation
    (ADC): per query, precompute the (m_sub, n_codes) inner-product
    table of its subvectors against the codebooks; a candidate's
    approximate cosine is m_sub numpy gathers + a sum — no float
    corpus in the scoring pass at all, only the uint8 codes. Same
    partial-top-k-per-block + tiny driver merge shape as
    brute_force_topk. Returns (query_id, rank, vec_id, cosine_pq)."""
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    books = pq_fit(sample, m_sub=m_sub, n_codes=n_codes, seed=seed)
    coded = pq_encode(ds, books, id_col=id_col, vec_col=vec_col)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    w = books.shape[2]
    # tables[qi, m, j] = q_sub(m) . book[m][j]
    tables = np.stack(
        [qn[:, m * w : (m + 1) * w] @ books[m].T for m in range(m_sub)],
        axis=1,
    )  # (n_q, m_sub, n_codes)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        codes = np.array(batch["pq_codes"].to_pylist(), dtype=np.int64)
        n = len(ids)
        sims = np.zeros((tables.shape[0], n))
        for m in range(codes.shape[1]):
            sims += tables[:, m, codes[:, m]]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = (
                np.argpartition(-row, k)[:k] if len(row) > k else np.arange(len(row))
            )
            out_q.extend([query_ids[qi]] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_sim.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine_pq": pa.array(out_sim, pa.float64()),
            }
        )

    parts = coded.map_batches(partial, batch_format="pyarrow")
    import pandas as pd

    df = parts.to_pandas()
    df = df.sort_values(
        ["query_id", "cosine_pq", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id", "cosine_pq"]], preserve_index=False
    ).replace_schema_metadata(None)


def ivfpq_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    m_sub: int = 16,
    n_codes: int = 256,
    train_sample: int = 2048,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-PQ (the FAISS-standard composition): the IVF coarse
    quantizer prunes the corpus to the queries' nprobe nearest lists
    in ONE assignment pass, and PQ's asymmetric-distance scoring ranks
    ONLY those candidates from uint8 codes. At scale this is the shape
    that serves 10^10 vectors: probe ~nprobe/n_lists of the corpus and
    never touch a float vector in the scoring loop."""
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    centroids = kmeans_fit(sample, n_lists, seed=seed)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsims = qn @ centroids.T
    nprobe = min(nprobe, n_lists)
    probe_lists = np.unique(
        np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
    ).astype(np.int64)
    probe_set = pa.array(probe_lists.tolist(), pa.int64())

    def assign_filter(batch: pa.Table) -> pa.Table:
        vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        lists = (vecs @ centroids.T).argmax(axis=1).astype(np.int64)
        keep = pa.compute.is_in(pa.array(lists, pa.int64()), value_set=probe_set)
        return batch.filter(keep)

    cand = ds.map_batches(assign_filter, batch_format="pyarrow")
    return pq_topk(
        cand,
        queries,
        query_ids,
        k=k,
        m_sub=m_sub,
        n_codes=n_codes,
        train_sample=train_sample,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
