"""Property-based tests (hypothesis) for the round-5 kernels:

1. `_salsa_ppm` — exact arbitrary-precision parity against Python int
   math across the full int64 range (both the vectorized fast path
   and the bigint fallback must agree with ground truth).
2. `_bucket_totals_merge` / prefix-sum partials — exact int64 sums
   even past 2^53 where a float64 accumulator loses bits, and
   associativity of the tree merge under arbitrary groupings.
3. The bit-parallel multi-source BFS inside
   `_harmonic_partials_broadcast` — per-(root, node) distances equal
   a reference per-root BFS on random digraphs (driven through the
   public kernel by comparing harmonic numerators).
4. Arms equivalence on RANDOM inputs for every two-arm planner:
   connected_components (this test found and killed a real bug — the
   distributed loop's convergence count ignored newly-discovered
   universe-growth rows and could stop before closure), dual_rank +
   hyperball (fixed-round growth semantics), and the lexical /
   containment broadcast-vs-partitioned pairs.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_ray.pipelines.queries import _salsa_ppm
from louis_crawler_legacy_ray.stages.scan import _bucket_totals_merge

pos64 = st.integers(min_value=1, max_value=2**62)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(pos64, pos64, pos64), min_size=0, max_size=8
    ),
    pos64,
)
def test_salsa_ppm_matches_bigint_truth(rows, n_auth):
    # semantic domain: a node's d_in never exceeds its component's
    # total d_in and a component never exceeds the authority set, so
    # ppm <= 1e6 always fits int64 — enforce the invariant on the
    # drawn triples (di <= cd, cs <= n_auth)
    rows = [(min(c, n_auth), min(d, t), t) for c, d, t in rows]
    cs = np.array([r[0] for r in rows], np.int64)
    di = np.array([r[1] for r in rows], np.int64)
    cd = np.array([r[2] for r in rows], np.int64)
    got = _salsa_ppm(cs, di, cd, n_auth)
    exp = [
        (int(c) * int(d) * 1_000_000) // (n_auth * int(t))
        for c, d, t in zip(cs, di, cd)
    ]
    assert list(got) == exp
    assert all(v >= 0 for v in exp)  # never a wrapped negative


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=2**52, max_value=2**55),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_bucket_totals_merge_exact_past_2_53(pairs, n_groups):
    """Totals past 2^53 (where float64 loses integer bits) stay exact,
    and the tree merge is grouping-invariant."""
    truth: dict[int, int] = {}
    for b, v in pairs:
        truth[b] = truth.get(b, 0) + v

    def blob(chunk):
        ks = np.array([p[0] for p in chunk], np.int64)
        vs = np.array([p[1] for p in chunk], np.int64)
        uniq, inv = np.unique(ks, return_inverse=True)
        sums = np.zeros(uniq.size, np.int64)
        np.add.at(sums, inv, vs)
        return np.stack([uniq, sums]).tobytes()

    # arbitrary grouping into n_groups leaf blobs, then one merge
    chunks = [pairs[i::n_groups] for i in range(n_groups)]
    blobs = [blob(c) for c in chunks if c]
    root = _bucket_totals_merge(blobs)
    arr = np.frombuffer(root, np.int64).reshape(2, -1)
    got = {int(k): int(v) for k, v in zip(arr[0], arr[1])}
    assert got == truth
    # associativity: merging pre-merged halves gives the same root
    if len(blobs) > 1:
        half = _bucket_totals_merge(blobs[: len(blobs) // 2])
        rest = _bucket_totals_merge(blobs[len(blobs) // 2 :])
        assert _bucket_totals_merge([half, rest]) == root


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.data())
def test_cc_arms_agree_on_random_graphs(ray_session, data):
    """Local union-find vs distributed pointer-jumping min-label CC on
    random pair tables, including ids outside all_ids (universe
    growth) and isolated all_ids nodes."""
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.dedup as dedup

    n_pairs = data.draw(st.integers(min_value=0, max_value=30))
    pairs = [
        (
            data.draw(st.integers(min_value=0, max_value=25)),
            data.draw(st.integers(min_value=0, max_value=25)),
        )
        for _ in range(n_pairs)
    ]
    ids = sorted(
        data.draw(
            st.sets(
                st.integers(min_value=0, max_value=30),
                min_size=1,
                max_size=20,
            )
        )
    )

    def mk_pairs():
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                    "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    def mk_ids():
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        )

    def rows(ds):
        recs = ds.to_pandas().to_dict("records")
        return sorted(tuple(sorted(r.items())) for r in recs)

    old = dedup.CC_LOCAL_EDGES
    try:
        dedup.CC_LOCAL_EDGES = 10**9
        local = rows(dedup.connected_components(mk_pairs(), mk_ids()))
        dedup.CC_LOCAL_EDGES = -1
        dist = rows(dedup.connected_components(mk_pairs(), mk_ids()))
    finally:
        dedup.CC_LOCAL_EDGES = old
    assert local == dist


@settings(max_examples=6, deadline=None, derandomize=True)
@given(st.data())
def test_dual_rank_and_hyperball_arms_agree_on_random_graphs(
    ray_session, data
):
    """Local exact-int fixpoints vs the distributed loops on random
    digraphs with edge endpoints outside the node table (universe
    growth) and random seed sets."""
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.graph as graph

    n_edges = data.draw(st.integers(min_value=1, max_value=25))
    edges = [
        (
            data.draw(st.integers(min_value=0, max_value=12)),
            data.draw(st.integers(min_value=0, max_value=12)),
        )
        for _ in range(n_edges)
    ]
    node_ids = sorted(
        data.draw(
            st.sets(
                st.integers(min_value=0, max_value=14),
                min_size=1,
                max_size=10,
            )
        )
    )
    # edges whose src never acquires a rank row are dropped by every
    # arm (local active mask ≡ broadcast pm-miss skip ≡ join miss)
    seeds = [node_ids[0]]

    def mk_e():
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        )

    def mk_n(col):
        return rd.from_arrow(
            pa.table({col: pa.array(node_ids, pa.int64())})
        )

    def rows(ds):
        recs = ds.to_pandas().to_dict("records")
        return sorted(tuple(sorted(r.items())) for r in recs)

    old = graph.GRAPH_LOCAL_EDGES
    try:
        graph.GRAPH_LOCAL_EDGES = 10**9
        dr_local = rows(graph.dual_rank(mk_e(), mk_n("v"), seeds=seeds))
        hb_local = rows(graph.hyperball_md5(mk_e(), mk_n("node"), rounds=3))
        graph.GRAPH_LOCAL_EDGES = -1
        dr_dist = rows(graph.dual_rank(mk_e(), mk_n("v"), seeds=seeds))
        hb_dist = rows(graph.hyperball_md5(mk_e(), mk_n("node"), rounds=3))
    finally:
        graph.GRAPH_LOCAL_EDGES = old
    assert dr_local == dr_dist
    assert hb_local == hb_dist


@settings(max_examples=3, deadline=None, derandomize=True)
@given(st.data())
def test_lexical_and_containment_arms_agree_on_random_docs(
    ray_session, data
):
    """Broadcast vs partitioned arms of lexical_near_pairs and
    containment_pairs on random word soups with planted duplicates."""
    import ray.data as rd

    import louis_crawler_legacy_ray.stages.dedup as dedup

    n = data.draw(st.integers(min_value=4, max_value=25))
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = []
    for i in range(n):
        if i % 3 == 2 and texts:
            texts.append(texts[-1] + " zeta")  # near/containment dup
        else:
            words = [
                vocab[data.draw(st.integers(min_value=0, max_value=5))]
                for _ in range(data.draw(st.integers(min_value=3, max_value=12)))
            ]
            texts.append(" ".join(words))

    def mk():
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(n)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def rows(ds):
        recs = ds.to_pandas().to_dict("records")
        return sorted(tuple(sorted(r.items())) for r in recs)

    oldL, oldC = dedup.LEXICAL_BROADCAST_ROWS, dedup.CONTAINMENT_BROADCAST_DOCS
    orig_bw = dedup._lexical_pairs_blockwise
    try:
        dedup.LEXICAL_BROADCAST_ROWS = 10**9
        dedup.CONTAINMENT_BROADCAST_DOCS = 10**9
        lex_b = rows(dedup.lexical_near_pairs(mk(), th_num=8, th_den=10))
        con_b = rows(dedup.containment_pairs(mk(), k=2, num=7, den=10))
        dedup.LEXICAL_BROADCAST_ROWS = -1
        dedup.CONTAINMENT_BROADCAST_DOCS = -1
        # 4 blocks instead of 64: the default tiling is overhead-bound
        # on toy corpora (64 blocks -> 2080 pair tasks per example)
        dedup._lexical_pairs_blockwise = (
            lambda f, tn, td, num_blocks=4: orig_bw(f, tn, td, num_blocks)
        )
        lex_p = rows(dedup.lexical_near_pairs(mk(), th_num=8, th_den=10))
        con_p = rows(dedup.containment_pairs(mk(), k=2, num=7, den=10))
    finally:
        dedup.LEXICAL_BROADCAST_ROWS = oldL
        dedup.CONTAINMENT_BROADCAST_DOCS = oldC
        dedup._lexical_pairs_blockwise = orig_bw
    assert lex_b == lex_p
    assert con_b == con_p


def _naive_harmonic(edges, n_nodes, max_depth, scale):
    """Reference: per-root BFS, sum scale//d per reached node."""
    from collections import deque

    adj = [[] for _ in range(n_nodes)]
    for s, d in edges:
        adj[s].append(d)
    hnum = [0] * n_nodes
    nreach = [0] * n_nodes
    for root in range(n_nodes):
        dist = [-1] * n_nodes
        dist[root] = 0
        q = deque([root])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for v in adj[u]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v in range(n_nodes):
            if dist[v] > 0:
                hnum[v] += scale // dist[v]
                nreach[v] += 1
    return hnum, nreach


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.data())
def test_bit_parallel_bfs_matches_naive(ray_session, data):
    """The 64-lane bit-parallel BFS produces the same harmonic
    numerators as a reference per-root BFS on random digraphs — in
    particular across the 64-root chunk boundary (n > 64)."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages.graph import (
        _harmonic_partials_broadcast,
    )
    from ray.data.aggregate import Sum

    n = data.draw(st.integers(min_value=2, max_value=80))
    n_edges = data.draw(st.integers(min_value=1, max_value=160))
    edges = [
        (
            data.draw(st.integers(min_value=0, max_value=n - 1)),
            data.draw(st.integers(min_value=0, max_value=n - 1)),
        )
        for _ in range(n_edges)
    ]
    max_depth, scale = 6, 60
    e_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    n_ds = rd.from_arrow(
        pa.table({"node": pa.array(list(range(n)), pa.int64())})
    )
    parts = _harmonic_partials_broadcast(e_ds, n_ds, "node", max_depth, scale)
    agg = (
        parts.groupby("node")
        .aggregate(Sum("hnum", alias_name="h"), Sum("one", alias_name="r"))
        .to_pandas()
    )
    got_h = {int(r["node"]): int(r["h"]) for _, r in agg.iterrows()}
    got_r = {int(r["node"]): int(r["r"]) for _, r in agg.iterrows()}
    exp_h, exp_r = _naive_harmonic(edges, n, max_depth, scale)
    for v in range(n):
        assert got_h.get(v, 0) == exp_h[v], f"hnum mismatch at {v}"
        assert got_r.get(v, 0) == exp_r[v], f"reach mismatch at {v}"
