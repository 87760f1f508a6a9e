"""Round-5 scale-guard regressions (VERDICT r4 "What's wrong" items):
the three remaining driver-side materializations are now behind
stats-driven row-count guards that route large inputs to distributed
paths. These tests FORCE the large-input route at toy scale and pin
(a) result equality with the broadcast/exact path and (b) bounded
driver-side state.

1. lexical_near_pairs: feature-matrix broadcast vs the partitioned
   block x block matmul (guard LEXICAL_BROADCAST_ROWS).
2. containment_pairs: shingle-size dict broadcast vs two partitioned
   hash joins (guard CONTAINMENT_BROADCAST_DOCS).
3. train_bigram_lm: uncapped dict fold vs top-K count pruning
   (caps MAX_LM_VOCAB / MAX_LM_BIGRAMS), V invariant under pruning.
"""

import numpy as np
import pyarrow as pa
import ray as ray_api

import louis_crawler_legacy_ray.stages.dedup as dedup
from louis_crawler_legacy_ray.stages.textstats import train_bigram_lm


def _docs_ds(rd, n=120):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n):
        if i % 3 == 0 and i > 0:
            # planted near-duplicate of the previous doc (one word off)
            texts.append(texts[-1].rsplit(" ", 1)[0] + " zz" + str(i))
        else:
            texts.append(
                " ".join(rng.choice(words, size=30, replace=True))
            )
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _rows(ds):
    recs = ds.to_pandas().to_dict("records")
    return sorted(tuple(sorted(r.items())) for r in recs)


def test_lexical_blockwise_matches_broadcast(ray_session, monkeypatch):
    import ray.data as rd

    ds = _docs_ds(rd)
    base = _rows(dedup.lexical_near_pairs(ds, th_num=8, th_den=10))
    assert base, "planted near-dups must produce pairs"

    called = {}
    orig = dedup._lexical_pairs_blockwise

    def spy(feats, th_num, th_den, num_blocks=64):
        called["yes"] = True
        return orig(feats, th_num, th_den, num_blocks=8)

    monkeypatch.setattr(dedup, "LEXICAL_BROADCAST_ROWS", 0)
    monkeypatch.setattr(dedup, "_lexical_pairs_blockwise", spy)
    ds2 = _docs_ds(rd)
    forced = _rows(dedup.lexical_near_pairs(ds2, th_num=8, th_den=10))
    assert called.get("yes"), "guard did not route to the blockwise path"
    assert forced == base


def test_containment_joined_matches_broadcast(ray_session, monkeypatch):
    import ray.data as rd

    ds = _docs_ds(rd, n=60)
    base = _rows(dedup.containment_pairs(ds, k=3, num=7, den=10))
    assert base, "planted near-dups must produce containment pairs"

    monkeypatch.setattr(dedup, "CONTAINMENT_BROADCAST_DOCS", 0)
    ds2 = _docs_ds(rd, n=60)
    forced = _rows(dedup.containment_pairs(ds2, k=3, num=7, den=10))
    assert forced == base


def test_cc_distributed_matches_local_unionfind(ray_session, monkeypatch):
    """connected_components' two arms (driver union-find under
    CC_LOCAL_EDGES vs the distributed min-label + pointer-jumping
    loop) agree on a multi-component graph with a long chain (the
    shape pointer jumping exists for)."""
    import ray.data as rd

    def pairs_ds():
        # a 40-node chain, a triangle, an isolated pair; PLUS pair ids
        # outside the id table: 301 rides a member component (gets a
        # row labeled by the member min), 400-401 form a memberless
        # component (no rows at all) — the distributed fixpoint's
        # universe-growth semantics both arms must share
        chain = [(i + 3, i + 4) for i in range(40)]
        extra = [
            (100, 101), (101, 102), (102, 100), (200, 201),
            (300, 301), (400, 401),
        ]
        a, b = zip(*(chain + extra))
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(a, pa.int64()),
                    "doc_b": pa.array(b, pa.int64()),
                }
            )
        )

    def ids_ds():
        ids = list(range(3, 45)) + [100, 101, 102, 200, 201, 300, 999]
        return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))

    local = _rows(dedup.connected_components(pairs_ds(), ids_ds()))
    monkeypatch.setattr(dedup, "CC_LOCAL_EDGES", 0)
    dist = _rows(dedup.connected_components(pairs_ds(), ids_ds()))
    assert dist == local
    # isolated node labels itself; chain collapses to its min id
    as_map = {dict(r)["doc_id"]: dict(r)["cluster_id"] for r in dist}
    assert as_map[999] == 999
    assert as_map[43] == 3 and as_map[201] == 200
    assert as_map[301] == 300  # non-member endpoint, member component
    assert 400 not in as_map and 401 not in as_map  # memberless comp


def test_dual_rank_local_matches_distributed(ray_session, monkeypatch):
    """dual_rank's driver-local exact-int arm (GRAPH_LOCAL_EDGES) and
    the distributed bulk-synchronous loop produce identical (v, pr,
    tr) tables — including the rank-universe growth for dsts outside
    the node table."""
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.graph as graph

    def mk():
        edges = rd.from_arrow(
            pa.table(
                {
                    # 900 is a dst OUTSIDE the node table (universe growth)
                    "src": pa.array([0, 0, 1, 2, 3, 4, 2], pa.int64()),
                    "dst": pa.array([1, 2, 2, 3, 0, 0, 900], pa.int64()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table({"v": pa.array([0, 1, 2, 3, 4, 5], pa.int64())})
        )
        return edges, nodes

    e1, n1 = mk()
    local = _rows(graph.dual_rank(e1, n1, seeds=[0, 3]))
    monkeypatch.setattr(graph, "GRAPH_LOCAL_EDGES", -1)
    e2, n2 = mk()
    dist = _rows(graph.dual_rank(e2, n2, seeds=[0, 3]))
    assert local == dist
    assert any(dict(r)["v"] == 900 for r in local)


def test_pagerank_trustrank_local_match_distributed(
    ray_session, monkeypatch
):
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.graph as graph

    def mk():
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 0, 1, 2, 3, 4, 2], pa.int64()),
                    "dst": pa.array([1, 2, 2, 3, 0, 0, 5], pa.int64()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table({"v": pa.array([0, 1, 2, 3, 4, 5], pa.int64())})
        )
        return edges, nodes

    e1, n1 = mk()
    pr_local = _rows(graph.pagerank(e1, n1))
    e1, n1 = mk()
    tr_local = _rows(graph.trustrank(e1, n1, seeds=[0]))
    monkeypatch.setattr(graph, "GRAPH_LOCAL_EDGES", -1)
    e2, n2 = mk()
    assert _rows(graph.pagerank(e2, n2)) == pr_local
    e2, n2 = mk()
    assert _rows(graph.trustrank(e2, n2, seeds=[0])) == tr_local


def test_hyperball_local_matches_distributed(ray_session, monkeypatch):
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.graph as graph

    def mk():
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 1, 2, 3, 4, 5, 6, 0], pa.int64()),
                    "dst": pa.array([1, 2, 3, 4, 5, 6, 0, 3], pa.int64()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table({"node": pa.array(list(range(8)), pa.int64())})
        )
        return edges, nodes

    e1, n1 = mk()
    local = _rows(graph.hyperball_md5(e1, n1, rounds=3))
    monkeypatch.setattr(graph, "GRAPH_LOCAL_EDGES", -1)
    e2, n2 = mk()
    dist = _rows(graph.hyperball_md5(e2, n2, rounds=3))
    assert local == dist


def test_bigram_lm_cap_bounds_driver_fold(ray_session):
    import ray.data as rd

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
        "the bird sat on the cat",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    cb_ref, cu_ref, v = train_bigram_lm(ds, max_vocab=None, max_bigrams=None)
    cb_full, cu_full = ray_api.get(cb_ref), ray_api.get(cu_ref)
    assert v == len(cu_full) > 5

    ds2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    cb_ref2, cu_ref2, v2 = train_bigram_lm(ds2, max_vocab=5, max_bigrams=7)
    cb_cap, cu_cap = ray_api.get(cb_ref2), ray_api.get(cu_ref2)
    # driver fold bounded by the caps
    assert len(cu_cap) == 5 and len(cb_cap) <= 7
    # V is the UNPRUNED type count (smoothing denominator invariant)
    assert v2 == v
    # kept entries are the true heavy hitters with their exact counts
    floor = min(cu_cap.values())
    assert all(
        c <= floor
        for w, c in cu_full.items()
        if w not in cu_cap
    ) or any(c == floor for c in cu_full.values())
    assert all(cu_full[w] == c for w, c in cu_cap.items())
    assert all(cb_full[k] == c for k, c in cb_cap.items())
