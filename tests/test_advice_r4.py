"""Regression tests for the round-4 ADVICE findings (all low).

1. sources/feeds.py _rfc822_to_iso: RFC 822 makes the weekday token
   optional; '12 Feb 2024 00:00:00 GMT' must parse, and a malformed
   pubDate must skip the item, not crash the batch.
2. pipelines/queries.py salsa score: comp_size * d_in * 1e6 wraps
   int64 at 10^10-page scale; _salsa_ppm must stay exact past the
   wrap point.
3. stages/graph.py block-count clamps: the iterative loops must clamp
   to the caller's num_buckets, not a hard-coded 32, and results must
   be invariant to the chosen bucket count.
4. pipelines/queries.py q_coverage_estimate: disjoint samples (m=0)
   must yield a NULL lp_est (DuckDB's division-by-zero semantics),
   not a ZeroDivisionError.
"""

import numpy as np
import pyarrow as pa

from louis_crawler_legacy_ray.sources.feeds import _rfc822_to_iso, parse_feed


def test_rfc822_optional_weekday():
    assert _rfc822_to_iso("Mon, 12 Feb 2024 00:00:00 GMT") == "2024-02-12"
    assert _rfc822_to_iso("12 Feb 2024 00:00:00 GMT") == "2024-02-12"


def test_parse_feed_skips_malformed_pubdate():
    xml = (
        "<rss><channel>"
        "<item><link>http://a/x</link>"
        "<pubDate>not a date at all</pubDate></item>"
        "<item><link>http://a/y</link>"
        "<pubDate>13 Feb 2024 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    items = parse_feed("a", xml)
    assert [i["url"] for i in items] == ["http://a/y"]
    assert items[0]["pub_date"] == "2024-02-13"


def test_salsa_ppm_exact_past_int64_wrap():
    from louis_crawler_legacy_ray.pipelines.queries import _salsa_ppm

    # cs * di * 1e6 = 4e9 * 4e9 * 1e6 = 1.6e25 >> 2^63: the naive
    # int64 product wraps; the guarded path must stay exact.
    cs = np.array([4_000_000_000, 3], np.int64)
    di = np.array([4_000_000_000, 2], np.int64)
    cd = np.array([8_000_000_000, 5], np.int64)
    n_auth = 10_000_000_000
    got = _salsa_ppm(cs, di, cd, n_auth)
    exp = [
        (4_000_000_000 * 4_000_000_000 * 1_000_000)
        // (n_auth * 8_000_000_000),
        (3 * 2 * 1_000_000) // (n_auth * 5),
    ]
    assert got.tolist() == exp
    # and the small-value vectorized fast path agrees with itself
    small = _salsa_ppm(cs[1:], di[1:], cd[1:], n_auth)
    assert small.tolist() == exp[1:]
    # DENOMINATOR overflow: numerator fits int64 but n_auth*cd wraps
    # (cs*di*1e6 = 1e15 < 2^63; n_auth*cd = 1e19 > 2^63) — the guard
    # must route to the exact path, not emit a wrapped negative
    cs2 = np.array([1_000_000], np.int64)
    di2 = np.array([1_000], np.int64)
    cd2 = np.array([1_000_000_000], np.int64)
    got2 = _salsa_ppm(cs2, di2, cd2, 10_000_000_000)
    assert got2.tolist() == [
        (1_000_000 * 1_000 * 1_000_000)
        // (10_000_000_000 * 1_000_000_000)
    ]
    assert got2[0] >= 0


def _toy_graph(rd):
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
                "dst": pa.array([1, 2, 0, 4, 5, 3, 6], pa.int64()),
            }
        )
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(list(range(8)), pa.int64())})
    )
    return edges, nodes


def test_graph_clamps_respect_num_buckets(ray_session):
    """k_core / label_propagation / hyperball with num_buckets=4 give
    the same rows as the default 32 — the clamp follows the caller."""
    import ray.data as rd

    from louis_crawler_legacy_ray.stages.graph import (
        hyperball_md5,
        k_core,
        label_propagation,
    )

    def rows(ds):
        recs = ds.to_pandas().to_dict("records")
        return sorted(tuple(sorted(r.items())) for r in recs)

    for fn, kw in (
        (k_core, {"k": 2}),
        (label_propagation, {"rounds": 2}),
        (hyperball_md5, {"rounds": 2}),
    ):
        e1, n1 = _toy_graph(rd)
        e2, n2 = _toy_graph(rd)
        assert rows(fn(e1, n1, **kw)) == rows(
            fn(e2, n2, num_buckets=4, **kw)
        ), fn.__name__


def test_coverage_estimate_null_lp_on_disjoint():
    """m = 0 emits a NULL lp_est (DuckDB div-by-zero parity), no crash
    — exercised through the product helper q_coverage_estimate uses."""
    from louis_crawler_legacy_ray.pipelines.queries import _coverage_table

    t = _coverage_table(5, 7, 0)
    assert t["lp_est"].null_count == 1
    assert t["chapman_est"][0].as_py() == (5 + 1) * (7 + 1) // 1 - 1
    t2 = _coverage_table(5, 7, 3)
    assert t2["lp_est"][0].as_py() == 5 * 7 / 3
