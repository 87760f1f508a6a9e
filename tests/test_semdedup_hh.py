"""Unit tests for the round-2 session-4 operators — SemDeDup
cluster-then-prune and Misra-Gries heavy hitters — beyond the DuckDB
oracles: naive-recompute parity on irregular random data, block-layout
invariance, and the MG sketch's undercount / superset guarantees on a
skewed distribution the synthetic corpus (31 near-uniform terms) does
not exercise."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.cluster import semdedup_survivors
from louis_crawler_legacy_ray.stages.sketches import (
    heavy_hitters,
    mg_compress,
)


# ------------------------------------------------------------------ semdedup


def _naive_semdedup(vecs: np.ndarray, ids: np.ndarray, centroids: np.ndarray,
                    cids: np.ndarray, tau: float):
    """Reference implementation: nearest centroid (tie -> smaller id),
    then drop v iff some u < v in the same cluster has cosine >= tau."""
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    cu, vu = unit(centroids.astype(np.float64)), unit(vecs.astype(np.float64))
    order = np.argsort(cids)
    assign = cids[order][(vu @ cu[order].T).argmax(axis=1)]
    survivors = []
    for v_pos in np.argsort(ids):
        v = ids[v_pos]
        dropped = any(
            ids[u_pos] < v
            and assign[u_pos] == assign[v_pos]
            and float(vu[u_pos] @ vu[v_pos]) >= tau
            for u_pos in range(len(ids))
        )
        if not dropped:
            survivors.append((int(v), int(assign[v_pos])))
    return sorted(survivors)


def test_semdedup_matches_naive(ray_session):
    rng = np.random.default_rng(11)
    n, d = 120, 8
    vecs = rng.normal(size=(n, d))
    # plant exact near-dup groups so the prune actually fires
    vecs[50] = vecs[10] + rng.normal(scale=1e-3, size=d)
    vecs[51] = vecs[10] + rng.normal(scale=1e-3, size=d)
    vecs[90] = vecs[70] * 2.0  # same direction, different norm
    ids = np.arange(n, dtype=np.int64)
    centroids = vecs[:5].copy()
    cids = np.arange(5, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]})
    ).repartition(7)
    out = semdedup_survivors(ds, centroids, list(cids), tau=0.9).to_pandas()
    got = sorted(zip(out["vec_id"].astype(int), out["centroid_id"].astype(int)))
    assert got == _naive_semdedup(vecs, ids, centroids, cids, 0.9)
    assert 50 not in set(out["vec_id"]) and 51 not in set(out["vec_id"])
    assert 90 not in set(out["vec_id"])  # cosine ignores magnitude


def test_semdedup_block_layout_invariant(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 6))
    tbl = pa.table(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    cents, cids = vecs[:3], [0, 1, 2]

    def run(parts):
        out = semdedup_survivors(
            ray.data.from_arrow(tbl).repartition(parts), cents, cids, tau=0.8
        ).to_pandas()
        return sorted(zip(out["vec_id"], out["centroid_id"]))

    assert run(1) == run(13)


# ------------------------------------------------------------ misra-gries


def test_mg_compress_bounds():
    rng = np.random.default_rng(5)
    # Zipf-ish: term i has count ~ N/(i+1)
    counts = Counter({f"t{i}": max(1, 5000 // (i + 1)) for i in range(400)})
    n = sum(counts.values())
    m = 50
    summ = mg_compress(counts, m)
    assert len(summ) <= m
    for term, est in summ.items():
        true = counts[term]
        assert est <= true
        assert true - est <= n // (m + 1) + 1  # undercount bound
    # every term with true count > n/(m+1) must survive compression
    for term, true in counts.items():
        if true > n / (m + 1):
            assert term in summ


def test_heavy_hitters_skewed_exact(ray_session):
    # 3 heavy terms (>1% of tokens) drowned in a 5000-term uniform tail
    rng = np.random.default_rng(9)
    docs = []
    for i in range(200):
        words = ["alpha"] * 6 + ["beta"] * 4 + ["gamma"] * 3
        words += [f"noise{rng.integers(0, 5000)}" for _ in range(40)]
        rng.shuffle(words)
        docs.append({"doc_id": i, "text": " ".join(words)})
    ds = ray.data.from_items(docs).repartition(11)
    out = heavy_hitters(ds, text_col="text", phi_pct=1, m=255)
    got = dict(zip(out["term"].to_pylist(), out["cnt"].to_pylist()))
    # exact oracle
    c = Counter()
    for d in docs:
        c.update(d["text"].split())
    n = sum(c.values())
    want = {t: k for t, k in c.items() if k * 100 >= n}
    assert got == want
    assert {"alpha", "beta", "gamma"} <= set(got)


def test_heavy_hitters_block_layout_invariant(ray_session):
    docs = [
        {"doc_id": i, "text": ("hot " * 8) + " ".join(f"w{i}x{j}" for j in range(30))}
        for i in range(150)
    ]

    def run(parts):
        out = heavy_hitters(
            ray.data.from_items(docs).repartition(parts),
            text_col="text",
            phi_pct=1,
            m=127,
        )
        return sorted(zip(out["term"].to_pylist(), out["cnt"].to_pylist()))

    assert run(2) == run(17)
