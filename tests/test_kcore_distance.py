"""k_core, distance_histogram and temperature_resample unit gates
(hand graphs / hand strata — the sf-scale oracles run in
test_queries_oracle.py)."""

import numpy as np
import pyarrow as pa


def _edges(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _nodes(n):
    import ray.data as rd

    return rd.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))


def test_k_core_hand_graph(ray_session):
    """K4 {0,1,2,3} with a pendant path 3-4-5 and a dangling triangle
    {5,6,7}: the 3-core is exactly the K4 (triangle nodes have degree
    2, the path peels), core_deg = 3 for members, 0 otherwise.
    Directed duplicates / reverse edges / self-loops don't inflate."""
    from louis_crawler_legacy_ray.stages.graph import k_core

    e = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
        (3, 4), (4, 5),                                   # pendant path
        (5, 6), (6, 7), (7, 5),                           # triangle
        (1, 0), (2, 2), (0, 1),                           # noise
    ]
    out = k_core(_edges(e), _nodes(9), k=3).take_all()
    got = {r["node"]: r["core_deg"] for r in out}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0}


def test_k_core_cascade_peel(ray_session):
    """Peeling must cascade: a chain hung off a K4 loses one node per
    round — k=2 on a path peels from both ends inward, leaving only
    the cycle."""
    from louis_crawler_legacy_ray.stages.graph import k_core

    # 4-cycle {0..3} + tail 3-4-5-6
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4), (4, 5), (5, 6)]
    out = k_core(_edges(e), _nodes(7), k=2).take_all()
    got = {r["node"]: r["core_deg"] for r in out}
    assert got == {0: 2, 1: 2, 2: 2, 3: 2, 4: 0, 5: 0, 6: 0}


def test_k_core_empty_core(ray_session):
    """A tree has an empty 2-core; every node reports core_deg 0 and
    the peel terminates well inside the iteration bound."""
    from louis_crawler_legacy_ray.stages.graph import k_core

    e = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
    out = k_core(_edges(e), _nodes(6), k=2).take_all()
    assert all(r["core_deg"] == 0 for r in out)
    assert len(out) == 6


def test_distance_histogram_path(ray_session):
    """Path 0-1-2-3: ordered pairs at d=1: 6, d=2: 4, d=3: 2; zeros
    beyond. Isolated node 4 adds nothing."""
    from louis_crawler_legacy_ray.stages.graph import distance_histogram

    e = [(0, 1), (1, 2), (2, 3)]
    out = distance_histogram(_edges(e), _nodes(5), max_depth=5).take_all()
    got = {r["d"]: r["pairs"] for r in out}
    assert got == {1: 6, 2: 4, 3: 2, 4: 0, 5: 0}


def test_distance_histogram_depth_cap(ray_session):
    """The cap truncates: a 7-path has pairs at d=6 that a max_depth=4
    run must not count; the histogram still emits exactly max_depth
    rows."""
    from louis_crawler_legacy_ray.stages.graph import distance_histogram

    e = [(i, i + 1) for i in range(6)]
    out = distance_histogram(_edges(e), _nodes(7), max_depth=4).take_all()
    got = {r["d"]: r["pairs"] for r in out}
    assert sorted(got) == [1, 2, 3, 4]
    assert got[1] == 12 and got[4] == 6


def test_temperature_resample_quotas(ray_session):
    """Quotas are floor(coeff*sqrt(n)) per stratum and the selected
    ids are the smallest multiplicative hashes — the head stratum is
    sampled at a LOWER rate than the tail (the temperature effect)."""
    import math

    import ray.data as rd

    from louis_crawler_legacy_ray.stages.sample import (
        sample_hash,
        temperature_resample,
    )

    # skewed strata: 64 'big', 9 'small'
    ids = list(range(64)) + list(range(100, 109))
    keys = ["big"] * 64 + ["small"] * 9
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(keys),
            }
        )
    )
    out = temperature_resample(ds, key_col="lang", id_col="doc_id", coeff=2)
    rows = out.take_all()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_key["big"]) == int(math.floor(2 * math.sqrt(64)))  # 16
    assert len(by_key["small"]) == int(math.floor(2 * math.sqrt(9)))  # 6
    # rate inversion: 16/64 = 0.25 < 6/9 = 0.67
    # selection = smallest hashes within the stratum
    big = np.array(sorted(range(64), key=lambda i: (sample_hash(np.array([i]))[0], i)))
    assert sorted(by_key["big"]) == sorted(int(x) for x in big[:16])


def test_label_propagation_two_cliques(ray_session):
    """LPA on two K4s joined by one bridge edge: each clique converges
    to its own min label; the bridge does not merge them (3 internal
    votes beat 1 external). Self-votes keep the isolated node 8 at its
    own label."""
    from louis_crawler_legacy_ray.stages.graph import label_propagation

    k4a = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k4b = [(4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)]
    e = k4a + k4b + [(3, 4)]
    out = label_propagation(_edges(e), _nodes(9), rounds=5).take_all()
    got = {r["node"]: r["community"] for r in out}
    assert got[8] == 8
    assert {got[i] for i in (0, 1, 2, 3)} == {0}
    assert {got[i] for i in (4, 5, 6, 7)} == {4}


def test_label_propagation_deterministic_rounds(ray_session):
    """A 2-path under exactly one round: ends adopt the middle-vs-self
    min; reruns produce identical labels (determinism across block
    layouts)."""
    from louis_crawler_legacy_ray.stages.graph import label_propagation

    e = [(0, 1), (1, 2)]
    a = {r["node"]: r["community"]
         for r in label_propagation(_edges(e), _nodes(3), rounds=1).take_all()}
    b = {r["node"]: r["community"]
         for r in label_propagation(
             _edges(e).repartition(3), _nodes(3), rounds=1).take_all()}
    assert a == b
    # each node votes {self, neighbors}: all counts 1 -> min label wins
    assert a == {0: 0, 1: 0, 2: 1}


def test_kmv_distinct_exact_and_estimate(ray_session):
    """KMV bottom-k: a group with fewer than k distinct values reports
    the EXACT count; a dense group estimates within 40% (k=16 has
    ~25% relative stddev); results are block-layout invariant."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages.sketches import kmv_distinct

    n_dense = 400
    keys = ["small"] * 30 + ["dense"] * n_dense
    vals = [i % 7 for i in range(30)] + list(range(n_dense))
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        rows = {
            r["k"]: r
            for r in kmv_distinct(ds, key_col="k", val_col="v", k=16).take_all()
        }
        assert rows["small"]["k_used"] == 7
        assert rows["small"]["est"] == 7.0
        assert rows["dense"]["k_used"] == 16
        assert abs(rows["dense"]["est"] - n_dense) / n_dense < 0.4
