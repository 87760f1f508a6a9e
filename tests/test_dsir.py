"""DSIR importance-selection tests beyond the DuckDB oracle: naive
reference parity, target-pull semantics, block-layout invariance, the
int64-overflow Python-int fallback, and the float log-mode scale path."""

import numpy as np
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.dsir import (
    DsirScorer,
    _doc_buckets,
    _md5_u64_lower,
    dsir_topk,
    dsir_weights,
)


def _corpus():
    """Two vocabularies: en docs say 'alpha beta', fr docs say 'gamma
    delta'; one mixed doc leans en."""
    rows = []
    for i in range(30):
        rows.append(
            {"doc_id": i, "lang": "en", "text": "alpha beta alpha beta"}
        )
    for i in range(30, 60):
        rows.append(
            {"doc_id": i, "lang": "fr", "text": "gamma delta gamma delta"}
        )
    rows.append({"doc_id": 60, "lang": "fr", "text": "alpha beta gamma"})
    return rows


def _naive_scores(rows, n_buckets=1024):
    """Independent O(all-pairs) reimplementation of the exact-int
    estimator, straight from the definition."""
    nt = [0] * n_buckets
    nr = [0] * n_buckets
    per_doc = {}
    for r in rows:
        bs = _doc_buckets(r["text"], n_buckets)
        per_doc[r["doc_id"]] = bs
        for b in bs:
            nr[b] += 1
            if r["lang"] == "en":
                nt[b] += 1
    t_tot, r_tot = sum(nt), sum(nr)
    w = [a * r_tot - b * t_tot for a, b in zip(nt, nr)]
    return {d: sum(w[b] for b in bs) for d, bs in per_doc.items() if bs}


def test_dsir_matches_naive_and_pulls_target(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows).repartition(4)
    got = {
        r["doc_id"]: r["score"]
        for r in dsir_topk(ds, k=61).iter_rows()
    }
    assert got == _naive_scores(rows)
    # every en doc outranks every fr doc; the mixed doc sits between
    en = [got[i] for i in range(30)]
    fr = [got[i] for i in range(30, 60)]
    assert min(en) > got[60] > max(fr)


def test_dsir_block_layout_invariant(ray_session):
    rows = _corpus()
    one = dsir_topk(ray.data.from_items(rows).repartition(1), k=10).take_all()
    many = dsir_topk(ray.data.from_items(rows).repartition(13), k=10).take_all()
    assert one == many


def test_dsir_skips_featureless_docs(ray_session):
    rows = _corpus() + [{"doc_id": 99, "lang": "en", "text": "   ...   "}]
    ids = {
        r["doc_id"] for r in dsir_topk(ray.data.from_items(rows), k=100).iter_rows()
    }
    assert 99 not in ids and len(ids) == 61


def test_scorer_python_int_fallback_exact():
    """Weights beyond int64 route through exact Python-int summation
    and overflow the schema loudly rather than wrapping silently."""
    import ray

    huge = 2**70
    n_buckets = 8
    w = [huge if b == _md5_u64_lower("alpha") % n_buckets else 0
         for b in range(n_buckets)]
    scorer = DsirScorer(ray.put(w), True, n_buckets=n_buckets)
    assert scorer.w_i64 is None
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["alpha alpha"], pa.string())})
    try:
        scorer(batch)
        raised = False
    except (OverflowError, pa.ArrowInvalid):
        raised = True
    assert raised  # 2*2**70 cannot be an int64 column


def test_log_mode_orders_like_exact(ray_session):
    rows = _corpus()
    ds = ray.data.from_items(rows)
    exact = [r["doc_id"] for r in dsir_topk(ds, k=61).iter_rows()]
    ref, is_exact = dsir_weights(ds, mode="log")
    assert not is_exact
    logd = ds.map_batches(
        DsirScorer,
        fn_constructor_args=(ref, False, "text", 1024),
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    # log-mode scores are DESCENDING in target-likeness too: the en
    # vocabulary gets NEGATIVE log(p_raw/p_t)-style weight here, so
    # compare by rank direction: en block beats fr block.
    s = dict(zip(logd["doc_id"], logd["score"]))
    assert min(s[i] for i in range(30)) > max(s[i] for i in range(30, 60))
    # and the exact-int ordering within the top block is preserved
    assert set(exact[:30]) == set(range(30))
