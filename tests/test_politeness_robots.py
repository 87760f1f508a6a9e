"""Politeness-policy derivation + robots cache + robots-gated crawl."""

from louis_crawler_legacy_ray.state.politeness import PolitenessPolicy, RobotsCache

ROBOTS = """User-agent: *
Disallow: /private/
Allow: /
"""


def test_policy_budget_derivation():
    p = PolitenessPolicy(start_delay_s=5.0, round_seconds=60.0)
    assert p.budget_for("a.ca") == 12  # 60/5
    p.observe_latency("a.ca", 115.0)  # slow host -> throttle up
    assert p.delay_for("a.ca") == 60.0  # clamped at max (settings.py:76)
    assert p.budget_for("a.ca") == 1
    p2 = PolitenessPolicy()
    p2.observe_latency("b.ca", 0.01)  # fast host -> delay shrinks
    assert p2.delay_for("b.ca") < 5.0


def test_robots_cache_default_off():
    rc = RobotsCache({"a.ca": ROBOTS})  # obey_robots=False (reference parity)
    assert rc.allowed("http://a.ca/private/x")


def test_robots_cache_enabled():
    rc = RobotsCache({"a.ca": ROBOTS}, obey_robots=True)
    assert rc.allowed("http://a.ca/public")
    assert not rc.allowed("http://a.ca/private/x")
    assert rc.allowed("http://unknown-host.ca/anything")  # no robots -> allowed
    assert rc.filter_urls(["http://a.ca/ok", "http://a.ca/private/no"]) == [
        True,
        False,
    ]


def test_crawl_with_robots_gate(ray_session, tmp_path):
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    edges = pa.table(
        {
            "src": ["http://a.ca/root", "http://a.ca/root"],
            "dst": ["http://a.ca/public", "http://a.ca/private/x"],
        }
    )
    robots = {"a.ca": ROBOTS}
    cfg = CrawlConfig(
        n_shards=2,
        max_depth=3,
        max_rounds=6,
        robots_txt_by_host=robots,
        obey_robots=True,
    )
    res = run_frontier(edges_expand(edges), ["http://a.ca/root"], cfg)
    fetched = set(res.order["url"].to_pylist())
    assert fetched == {"http://a.ca/root", "http://a.ca/public"}
    assert res.counts["errored"] == 1  # the robots-disallowed url


def test_token_bucket_carries_and_bursts(ray_session):
    """per_host_budget=2, politeness='token_bucket': the seed round
    spends 1 of 2 tokens, so the next round bursts to 3 (carry), then
    back to the 2/round rate — vs the flat budget's strict 2/round.
    Long-run rate stays <= budget/round in both modes."""
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    children = [f"http://a.ca/c{i}" for i in range(5)]
    edges = pa.table(
        {
            "src": ["http://a.ca/root"] * 5,
            "dst": children,
        }
    )

    flat = run_frontier(
        edges_expand(edges),
        ["http://a.ca/root"],
        CrawlConfig(n_shards=2, max_depth=3, per_host_budget=2),
    )
    bucket = run_frontier(
        edges_expand(edges),
        ["http://a.ca/root"],
        CrawlConfig(
            n_shards=2, max_depth=3, per_host_budget=2, politeness="token_bucket"
        ),
    )
    # same URL set either way
    assert set(flat.order["url"].to_pylist()) == set(bucket.order["url"].to_pylist())
    # flat: 1, 2, 2, 1 -> 4 rounds; bucket: 1, 3 (burst), 2 -> 3 rounds
    assert [m["selected"] for m in flat.metrics] == [1, 2, 2, 1]
    assert [m["selected"] for m in bucket.metrics] == [1, 3, 2]


def test_robots_from_corpus_roundtrip(ray_session, tmp_path):
    """robots.txt rows planted in a pages corpus are discovered by the
    distributed scan and gate a crawl exactly like hand-provided
    bodies."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from louis_crawler_legacy_ray.state.politeness import robots_from_corpus

    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": [
                    "http://a.ca/robots.txt",
                    "http://a.ca/root",
                    "http://b.ca/deep/robots.txt",  # not at the root: ignored
                ],
                "html": [ROBOTS, "<main>hi</main>", "junk"],
            }
        ),
        str(d / "part.parquet"),
    )
    got = robots_from_corpus(str(d))
    assert got == {"a.ca": ROBOTS}
    rc = RobotsCache(got, obey_robots=True)
    assert not rc.allowed("http://a.ca/private/x")
    assert rc.allowed("http://a.ca/ok")
