"""Unit tests for distributed PageRank (stages/graph.py) and the
bloom-filter semi-join (stages/bloom.py) beyond the DuckDB oracles:
naive-recompute parity on a hand-built graph, block-layout invariance,
bloom no-false-negative guarantee and both verify modes."""

import numpy as np
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.bloom import (
    _hash_pair,
    bloom_semi_join,
    build_bloom,
)
from louis_crawler_legacy_ray.stages.graph import pagerank

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 3 has no in-edges
NODES = [0, 1, 2, 3]


def _naive_pagerank(edges, nodes, iters, scale=10**12):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale for v in nodes}
    base = (scale * 15) // 100
    for _ in range(iters):
        agg = {v: 0 for v in nodes}
        for s, d in edges:
            agg[d] += r[s] // outdeg[s]
        r = {v: base + (85 * agg[v]) // 100 for v in nodes}
    return r


def _ranks_dict(edges, nodes, iters, parts):
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(parts)
    n = ray.data.from_items([{"v": v} for v in nodes]).repartition(parts)
    df = pagerank(e, n, iterations=iters).to_pandas()
    return dict(zip(df["v"], df["r"]))


def test_pagerank_matches_naive(ray_session):
    for iters in (1, 3):
        got = _ranks_dict(EDGES, NODES, iters, parts=2)
        assert got == _naive_pagerank(EDGES, NODES, iters)


def test_pagerank_block_layout_invariant(ray_session):
    assert _ranks_dict(EDGES, NODES, 2, parts=1) == _ranks_dict(
        EDGES, NODES, 2, parts=5
    )


def test_pagerank_dangling_and_isolated(ray_session):
    # node 9 dangling-and-isolated: keeps only the base mass
    edges = [(0, 1), (1, 0)]
    nodes = [0, 1, 9]
    got = _ranks_dict(edges, nodes, 2, parts=2)
    assert got == _naive_pagerank(edges, nodes, 2)
    assert got[9] == (10**12 * 15) // 100


def test_hash_pair_is_deterministic_and_odd():
    ks = np.array([0, 1, 2**62, -5], dtype=np.int64)
    h1a, h2a = _hash_pair(ks)
    h1b, h2b = _hash_pair(ks.copy())
    assert (h1a == h1b).all() and (h2a == h2b).all()
    assert (h2a % 2 == 1).all()  # double hashing needs odd stride


def test_bloom_semi_join_exact_both_modes(ray_session):
    left = ray.data.from_items(
        [{"k": i, "val": i * 10} for i in range(2000)]
    ).repartition(8)
    keys = [7, 42, 999, 1500, 1999]
    right = ray.data.from_items([{"rk": k} for k in keys])
    for mode in ("broadcast", "partitioned"):
        out = bloom_semi_join(left, right, "k", "rk", verify=mode)
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert list(df["k"]) == keys, mode
        assert list(df["val"]) == [k * 10 for k in keys], mode


def test_bloom_prune_has_no_false_negatives(ray_session):
    # probe the raw bitmap directly: every inserted key must test positive
    m_bits, k = 1 << 14, 4
    keys = np.arange(0, 5000, 7, dtype=np.int64)
    ds = ray.data.from_items([{"rk": int(x)} for x in keys]).repartition(4)
    import ray as _ray

    bits = _ray.get(build_bloom(ds, "rk", m_bits=m_bits, k=k))
    h1, h2 = _hash_pair(keys)
    ok = np.ones(len(keys), bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        ok &= (bits[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
    assert ok.all()


def _naive_trustrank(edges, nodes, seeds, iters, scale=10**12):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: (scale if v in seeds else 0) for v in nodes}
    base = (scale * 15) // 100
    for _ in range(iters):
        agg = {v: 0 for v in nodes}
        for s, d in edges:
            agg[d] += r[s] // outdeg[s]
        r = {
            v: (base if v in seeds else 0) + (85 * agg[v]) // 100
            for v in nodes
        }
    return r


def test_trustrank_matches_naive_and_demotes_spam(ray_session):
    from louis_crawler_legacy_ray.stages.graph import trustrank

    # trusted core 0->1->2->0 plus a spam farm 3<->4 unreachable from
    # the seeds (it even links INTO the core at 2)
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (3, 2)]
    nodes = [0, 1, 2, 3, 4]
    seeds = [0]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(3)
    n = ray.data.from_items([{"v": v} for v in nodes]).repartition(2)
    df = trustrank(e, n, seeds, iterations=3).to_pandas()
    got = dict(zip(df["v"], df["r"]))
    assert got == _naive_trustrank(edges, nodes, set(seeds), 3)
    # spam farm gets NO trust (unreachable from the seed set), while
    # uniform-teleport PageRank keeps funding it
    assert got[3] == 0 and got[4] == 0
    pr = _ranks_dict(edges, nodes, 3, 2)
    assert pr[3] > 0 and pr[4] > 0


def test_hits_matches_naive(ray_session):
    from louis_crawler_legacy_ray.stages.graph import hits

    # classic hub/authority split: 0 and 1 are hubs pointing at
    # authorities 2 and 3; 4 is isolated
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (3, 2)]
    nodes = [0, 1, 2, 3, 4]

    h = {v: 1 for v in nodes}
    for _ in range(3):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(3)
    n = ray.data.from_items([{"v": v} for v in nodes]).repartition(2)
    df = hits(e, n, iterations=3).to_pandas()
    got_h = dict(zip(df["v"], df["h"]))
    got_a = dict(zip(df["v"], df["a"]))
    assert got_h == h and got_a == a
    assert got_a[2] > got_a[3] > got_a[0] == 0  # authority order
    assert got_h[0] == got_h[1] > got_h[3] > got_h[2] == 0  # hub order
    assert got_h[4] == 0 and got_a[4] == 0  # isolated node present, zero


def test_score_join_strategies_agree(ray_session):
    """The stats-driven broadcast-vs-shuffle score join must be
    result-invariant: force the partitioned branch and compare bits."""
    import louis_crawler_legacy_ray.stages.graph as g

    e = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in EDGES]
    ).repartition(3)
    n = ray.data.from_items([{"v": v} for v in NODES]).repartition(2)
    bc = g.pagerank(e, n, iterations=3).to_pandas().sort_values("v")
    old = g.BROADCAST_SCORE_ROWS
    try:
        g.BROADCAST_SCORE_ROWS = 0  # force the shuffle branch
        sh = g.pagerank(e, n, iterations=3).to_pandas().sort_values("v")
    finally:
        g.BROADCAST_SCORE_ROWS = old
    assert bc.reset_index(drop=True).equals(sh.reset_index(drop=True))


def test_spam_mass_flags_link_farm(ray_session):
    """Spam mass (Gyöngyi et al. 2006) composed from the two fixpoints:
    the farm (unreachable from the trusted seed) carries all its
    pagerank as spam mass; the trusted core's normalized trust exceeds
    the 0.6 relative threshold so it is cleared."""
    from louis_crawler_legacy_ray.stages.graph import pagerank, trustrank

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (3, 2)]
    nodes = [0, 1, 2, 3, 4]
    seeds = [0]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(3)
    n = ray.data.from_items([{"v": v} for v in nodes]).repartition(2)
    pr = dict(
        zip(*(lambda df: (df["v"], df["r"]))(pagerank(e, n, iterations=3).to_pandas()))
    )
    tr = dict(
        zip(
            *(lambda df: (df["v"], df["r"]))(
                trustrank(e, n, seeds, iterations=3).to_pandas()
            )
        )
    )
    n_nodes, n_seeds = len(nodes), len(seeds)
    base = (10**12 * 15) // 100
    flags = {}
    for v in nodes:
        trust_norm = tr[v] * n_nodes // n_seeds
        mass = pr[v] - trust_norm
        flags[v] = 100 * mass > 60 * pr[v] and pr[v] > base
    # the farm is spam-flagged; the seeded core is not
    assert flags[3] and flags[4]
    assert not flags[0] and not flags[1] and not flags[2]


def test_dual_rank_matches_separate(ray_session):
    """The fused dual-channel fixpoint is bit-identical to running
    pagerank and trustrank separately, in both join strategies."""
    import louis_crawler_legacy_ray.stages.graph as g

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (3, 2), (0, 2)]
    nodes = [0, 1, 2, 3, 4]
    seeds = [0, 2]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(3)
    n = ray.data.from_items([{"v": v} for v in nodes]).repartition(2)
    pr = g.pagerank(e, n, iterations=3).to_pandas().set_index("v")["r"]
    tr = g.trustrank(e, n, seeds, iterations=3).to_pandas().set_index("v")["r"]
    for force_shuffle in (False, True):
        old = g.BROADCAST_SCORE_ROWS
        try:
            if force_shuffle:
                g.BROADCAST_SCORE_ROWS = 0
            dual = g.dual_rank(e, n, seeds, iterations=3).to_pandas().set_index("v")
        finally:
            g.BROADCAST_SCORE_ROWS = old
        for v in nodes:
            assert dual.loc[v, "pr"] == pr.loc[v]
            assert dual.loc[v, "tr"] == tr.loc[v]


def test_harmonic_centrality_paths_agree(ray_session, monkeypatch):
    """Broadcast-CSR BFS and bulk-synchronous shuffle BFS produce the
    same exact scaled-int harmonic sums; values match a naive
    all-pairs recompute (directed chain + cycle + isolated node)."""
    import itertools

    import ray.data as rd

    from louis_crawler_legacy_ray.stages import graph as G

    # 0->1->2->3, 4<->5, 6 isolated, plus 3->0 closing a 4-cycle
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 4)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.int64()),
                "dst": pa.array([b for _, b in e], pa.int64()),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(range(7), pa.int64())}))

    def run():
        out = G.harmonic_centrality(edges, nodes, max_depth=15, scale=360360)
        return {
            r["node"]: (r["harmonic_num"], r["reachable"])
            for r in out.take_all()
        }

    broadcast = run()
    monkeypatch.setattr(G, "HARMONIC_BROADCAST_EDGES", 0)
    shuffle = run()
    assert broadcast == shuffle

    # naive truth
    adj = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    truth = {n: [0, 0] for n in range(7)}
    for root in range(7):
        dist = {root: 0}
        q = [root]
        while q:
            nq = []
            for u in q:
                for v in adj.get(u, []):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        for v, d in dist.items():
            if d > 0:
                truth[v][0] += 360360 // d
                truth[v][1] += 1
    assert broadcast == {n: tuple(v) for n, v in truth.items()}
    assert broadcast[6] == (0, 0)  # isolated


def test_hyperball_md5_matches_exact_ball_registers(ray_session, monkeypatch):
    """hyperball_md5: the round-4 register state equals registers
    computed directly from the exact ball B(u,4); broadcast-pull and
    shuffle-join paths agree."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages import graph as G
    from louis_crawler_legacy_ray.stages.dedup import _md5_u64_lower

    e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (6, 0)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.int64()),
                "dst": pa.array([b for _, b in e], pa.int64()),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(range(7), pa.int64())}))

    def run():
        out = G.hyperball_md5(edges, nodes, rounds=4)
        return {
            r["node"]: (
                r["nonzero_regs"],
                r["harmonic_denom"],
                r["est_raw"],
            )
            for r in out.take_all()
        }

    got = run()
    monkeypatch.setattr(G, "BROADCAST_SCORE_ROWS", 0)
    assert run() == got

    adj = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    m, cap = G.HYPERBALL_M, G.HYPERBALL_VCAP
    for u in range(7):
        ball, frontier = {u}, [u]
        for _ in range(4):
            nxt = [v for x in frontier for v in adj.get(x, []) if v not in ball]
            ball.update(nxt)
            frontier = nxt
        regs = {}
        for v in ball:
            h = _md5_u64_lower(str(v))
            w = (h // m) % cap
            r = (w & -w) if w else cap
            regs[h % m] = max(regs.get(h % m, 0), r)
        s = sum(
            (2 * cap) // (2 * regs[j]) if j in regs else 2 * cap
            for j in range(m)
        )
        assert got[u] == (len(regs), s, G.HYPERBALL_C / s)


def test_bowtie_components_hand_graph(ray_session):
    """bowtie_components on a textbook bowtie: 3-cycle giant SCC {1,2,3},
    IN node 0 -> 1, OUT node 4 <- 3, 2-cycle {5,6} (smaller SCC that
    reaches nothing -> its nodes classify by reachability), isolated 7."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages.graph import bowtie_components

    e = [(1, 2), (2, 3), (3, 1), (0, 1), (3, 4), (5, 6), (6, 5)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.int64()),
                "dst": pa.array([b for _, b in e], pa.int64()),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(range(8), pa.int64())}))
    out = bowtie_components(edges, nodes).take_all()
    got = {r["node"]: (r["scc_id"], r["bowtie_class"]) for r in out}
    assert got == {
        0: (0, "in"),
        1: (1, "scc"),
        2: (1, "scc"),
        3: (1, "scc"),
        4: (4, "out"),
        5: (5, "tendril"),
        6: (5, "tendril"),
        7: (7, "tendril"),
    }


def test_triangle_counts_hand_graph(ray_session):
    """triangle_counts: K4 minus one edge has 2 triangles; nodes on
    the missing edge join 1 each, the shared diagonal nodes 2 each;
    directed duplicates, reverse edges and self-loops don't inflate."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages.graph import triangle_counts

    # K4 on {0,1,2,3} minus edge (0,3); noisy input: both directions
    # for (0,1), a self-loop, an isolated node 9
    e = [(0, 1), (1, 0), (0, 2), (1, 2), (1, 3), (2, 3), (2, 2)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.int64()),
                "dst": pa.array([b for _, b in e], pa.int64()),
            }
        )
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array([0, 1, 2, 3, 9], pa.int64())})
    )
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(edges, nodes).take_all()
    }
    assert got == {0: 1, 1: 2, 2: 2, 3: 1, 9: 0}


def test_graph_compress_invariants(ray_session):
    """graph_compress: per-row gamma identity (gamma_bits ==
    (2*bucket+1) * n_gaps — every gap in bucket b costs exactly
    2b+1 gamma bits), exactly one 'first' gap per page with
    out-links, and total gaps == total edges of the extracted
    multihost graph."""
    from louis_crawler_legacy_ray.pipelines.queries import (
        _mh_int_graph,
        q_graph_compress,
    )

    sf = "/root/testdata/sf0.001"
    out = q_graph_compress(sf).to_pandas()
    assert ((2 * out["bucket"] + 1) * out["n_gaps"] == out["gamma_bits"]).all()
    assert (out["varint_bytes"] >= out["n_gaps"]).all()

    edges, _, _ = _mh_int_graph(sf)
    n_edges = edges.count()
    n_srcs = edges.unique("src")
    assert out["n_gaps"].sum() == n_edges
    assert out.loc[out["kind"] == "first", "n_gaps"].sum() == len(n_srcs)


def test_salsa_scores_invariants(ray_session):
    """salsa_scores: cluster_id is the component min node, per-node
    scores are monotone in d_in within a component, and each
    component's scores sum to ~comp_size/n_auth (floor slack only)."""
    from louis_crawler_legacy_ray.pipelines.queries import q_salsa_scores

    out = q_salsa_scores("/root/testdata/sf0.001").to_pandas()
    n_auth = len(out)
    for cid, g in out.groupby("cluster_id"):
        assert g["node"].min() == cid
        assert (g["comp_size"] == len(g)).all()
        assert (g["comp_din"] == g["d_in"].sum()).all()
        # exact stationary mass of the component, scaled to ppm
        mass = len(g) * 1_000_000 / n_auth
        assert mass - len(g) <= g["score_ppm"].sum() <= mass
        srt = g.sort_values(["d_in", "score_ppm"])
        assert srt["score_ppm"].is_monotonic_increasing
