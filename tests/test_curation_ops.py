"""Unit tests for the round-2 curation operators — weighted sampling,
benchmark decontamination, label centroids / nearest-centroid
assignment, tf-idf top terms — beyond the DuckDB oracles: block-layout
invariance, naive-recompute parity, and edge cases the synthetic
corpus does not exercise."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.cluster import (
    assign_nearest_centroid,
    label_centroids,
)
from louis_crawler_legacy_ray.stages.decontam import (
    benchmark_ngrams,
    decontaminate,
    doc_ngrams,
)
from louis_crawler_legacy_ray.stages.sample import sample_hash, weighted_sample
from louis_crawler_legacy_ray.stages.textstats import tfidf_topk


# ------------------------------------------------------------------ weighted


def _wsample(ds, k):
    out = weighted_sample(ds, id_col="id", weight_col="w", k=k).to_pandas()
    return list(out["id"])


def test_weighted_sample_block_layout_invariant(ray_session):
    rows = [{"id": i, "w": float(1 + (i * 7) % 13)} for i in range(300)]
    one = ray.data.from_items(rows).repartition(1)
    many = ray.data.from_items(rows).repartition(16)
    assert _wsample(one, 10) == _wsample(many, 10)


def test_weighted_sample_matches_naive(ray_session):
    rows = [{"id": i, "w": float(1 + i % 5)} for i in range(100)]
    got = _wsample(ray.data.from_items(rows), 7)
    ids = np.arange(100)
    w = np.array([1.0 + i % 5 for i in range(100)])
    key = sample_hash(ids).astype(np.float64) / w
    expect = [int(ids[j]) for j in np.lexsort((ids, key))[:7]]
    assert got == expect


def test_weighted_sample_prefers_heavy(ray_session):
    # one row is 10^6 x heavier than the rest -> its race key is ~10^6
    # smaller; it must be selected
    rows = [{"id": i, "w": 1.0} for i in range(1, 50)]
    rows.append({"id": 50, "w": 1e6})
    assert 50 in _wsample(ray.data.from_items(rows), 5)


# ---------------------------------------------------------------- decontam


def test_doc_ngrams_short_doc():
    assert doc_ngrams("one two", 3) == set()
    assert doc_ngrams("", 2) == set()
    assert doc_ngrams("a b c d", 3) == {"a b c", "b c d"}


def test_decontaminate_drops_overlap(ray_session):
    bench = ray.data.from_items([{"text": "alpha beta gamma delta"}])
    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "x y alpha beta gamma z"},  # shares a 3-gram
            {"doc_id": 2, "text": "totally clean document here"},
            {"doc_id": 3, "text": "beta gamma alpha"},  # same words, no 3-gram
            {"doc_id": 4, "text": "too short"},
        ]
    )
    grams = benchmark_ngrams(bench, 3)
    assert grams == {"alpha beta gamma", "beta gamma delta"}
    kept = sorted(
        decontaminate(corpus, grams, 3).to_pandas()["doc_id"].tolist()
    )
    assert kept == [2, 3, 4]


# ---------------------------------------------------------------- centroids


def test_label_centroids_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 4))
    labels = [i % 3 for i in range(40)]
    rows = [
        {"label": labels[i], "embedding": vecs[i].tolist()} for i in range(40)
    ]
    out = (
        label_centroids(ray.data.from_items(rows).repartition(8))
        .to_pandas()
        .sort_values(["label", "dim"])
    )
    for lab in range(3):
        want = vecs[np.array(labels) == lab].mean(axis=0).round(6)
        got = out[out["label"] == lab]["centroid"].to_numpy()
        assert np.allclose(got, want, atol=1e-9)
        assert (out[out["label"] == lab]["n"] == (np.array(labels) == lab).sum()).all()


def test_assign_nearest_centroid_ties_to_smaller_id(ray_session):
    # two identical centroids -> every vector ties; smaller cid wins
    cents = np.array([[1.0, 0.0], [1.0, 0.0]])
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": [1.0, float(i)]} for i in range(5)]
    )
    out = assign_nearest_centroid(ds, cents, [9, 3]).to_pandas()
    assert (out["centroid_id"] == 3).all()


def test_assign_nearest_centroid_cosine(ray_session):
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    ds = ray.data.from_items(
        [
            {"vec_id": 0, "embedding": [5.0, 1.0]},  # -> centroid 0
            {"vec_id": 1, "embedding": [0.1, 2.0]},  # -> centroid 1
        ]
    )
    out = (
        assign_nearest_centroid(ds, cents, [10, 20])
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["centroid_id"].tolist() == [10, 20]


# ------------------------------------------------------------------- tfidf


def test_tfidf_topk_matches_naive(ray_session):
    texts = {
        1: "apple apple banana cherry",
        2: "banana cherry cherry date",
        3: "apple date date date",
    }
    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]
    out = tfidf_topk(ray.data.from_items(rows).repartition(3), k=2).to_pandas()
    # naive recompute
    from collections import Counter

    df = Counter()
    for t in texts.values():
        df.update(set(t.split()))
    for doc_id, t in texts.items():
        tf = Counter(t.split())
        scored = sorted(
            ((term, c * math.log(3 / df[term])) for term, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        got = out[out["doc_id"] == doc_id].sort_values("rank")["term"].tolist()
        assert got == [term for term, _ in scored], doc_id


# ------------------------------------------------------------ gram / PCA


def test_gram_matrix_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((400, 8))
    rows = [{"id": i, "embedding": x[i].tolist()} for i in range(400)]
    ds = ray.data.from_items(rows).repartition(7)
    from louis_crawler_legacy_ray.stages.cluster import (
        gram_matrix,
        top_principal_component,
    )

    g = gram_matrix(ds, "embedding")
    assert np.allclose(g, x.T @ x, atol=1e-8)
    v = top_principal_component(ds, "embedding")
    # compare against numpy's top eigenvector of the Gram matrix
    w, vecs = np.linalg.eigh(x.T @ x)
    ref = vecs[:, -1]
    k = int(np.argmax(np.abs(ref)))
    if ref[k] < 0:
        ref = -ref
    assert np.allclose(np.abs(v @ ref), 1.0, atol=1e-6)


def test_boilerplate_strip_threshold_both_sides(ray_session):
    """Within-host template removal: host-universal lines and the
    2/3-frequency line are stripped, the 1/11 promo and the body
    survive; threshold is the exact rational 1/2."""
    import pyarrow as pa
    import ray.data

    from louis_crawler_legacy_ray.stages.dedup import boilerplate_strip

    rows = []
    for d in range(12):
        h = f"h{d % 2}"
        lines = [f"nav {h}"]
        if d % 3 != 0:  # 2/3 of docs -> flagged
            lines.append(f"sale {h}")
        if d == 5:  # singleton -> survives
            lines.append("promo only once")
        lines.append(f"body {d}")
        rows.append({"doc_id": d, "host": h, "text": "\n".join(lines)})
    ds = ray.data.from_items(rows).repartition(3)
    out = boilerplate_strip(ds).to_pandas().sort_values("doc_id")
    for _, r in out.iterrows():
        d = r["doc_id"]
        kept = r["clean_text"].split("\n")
        assert f"body {d}" in kept
        assert not any(k.startswith("nav ") for k in kept)
        assert not any(k.startswith("sale ") for k in kept)
        if d == 5:
            assert "promo only once" in kept
    exp_removed = [1 if d % 3 == 0 else 2 for d in range(12)]
    assert list(out["n_removed"]) == exp_removed
