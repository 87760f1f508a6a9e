"""Real-HTTP fetcher over the Fetcher seam, driven end-to-end against
an in-process loopback server (VERDICT r3 'Next round' #1).

The loopback server (sources/loopback.py) serves the synthetic corpus
with vhosting by Host header and logs (ts, host, path) per request, so
these tests check the things result-parity alone cannot:

* a crawl through HttpFetcher hash-matches the corpus-join crawl
  (order, seen set, 404 quarantine) — the template is
  test_injected_fetcher_matches_corpus_crawl;
* non-200 statuses quarantine exactly like missing pages;
* per-host politeness delay appears as REAL wall-time gaps between a
  host's consecutive requests while other hosts interleave freely;
* the session-per-worker lifecycle holds: N same-host fetches reuse
  ONE keep-alive TCP connection (reference
  playwright_middleware.py:48-63 — one browser per worker).
"""

import pyarrow as pa

from louis_crawler_legacy_ray.pipelines.crawl import (
    CrawlConfig,
    clear_pages_cache,
    run_crawl,
    run_crawl_with_fetcher,
)
from louis_crawler_legacy_ray.sources.loopback import (
    CorpusHTTPServer,
    LoopbackResolver,
)
from louis_crawler_legacy_ray.sources.pages import write_pages_parquet
from louis_crawler_legacy_ray.stages.fetch import (
    HttpFetcher,
    make_http_fetcher_factory,
)

PAGES = {
    # two hosts, cross links, one dead link (-> 404 quarantine), one
    # island page never discovered
    "http://h0.ca/a": ["/b", "http://h1.ca/x", "/dead"],
    "http://h0.ca/b": ["/c"],
    "http://h0.ca/c": ["http://h1.ca/y"],
    "http://h1.ca/x": ["/y"],
    "http://h1.ca/y": ["http://h0.ca/a"],
    "http://h1.ca/island": [],
}


def _page(url: str, links: list[str]) -> str:
    anchors = "".join(f'<a href="{l}">x</a>' for l in links)
    body = f"<h1>{url}</h1>" + ("content words here " * 30)
    return f"<html><body><main>{body}{anchors}</main></body></html>"


HTML = {u: _page(u, ls) for u, ls in PAGES.items()}


def _corpus_dir(tmp_path) -> str:
    t = pa.table(
        {
            "url": pa.array(list(HTML), pa.string()),
            "html": pa.array(list(HTML.values()), pa.string()),
        }
    )
    d = str(tmp_path / "pages")
    write_pages_parquet(t, d)
    return d


def test_http_crawl_matches_corpus_crawl(ray_session, tmp_path):
    """End-to-end: run_crawl_with_fetcher(HttpFetcher over loopback)
    reproduces the corpus-join crawl byte-for-byte — order, seen set,
    and the dead-link quarantine."""
    d = _corpus_dir(tmp_path)
    cfg = dict(n_shards=2, max_depth=5, max_rounds=20)
    clear_pages_cache()
    via_corpus = run_crawl(d, ["http://h0.ca/a"], CrawlConfig(**cfg))

    with CorpusHTTPServer(HTML) as srv:
        factory = make_http_fetcher_factory(resolve=LoopbackResolver(srv.port))
        via_http = run_crawl_with_fetcher(
            factory, ["http://h0.ca/a"], CrawlConfig(**cfg)
        )
        n_requests = len(srv.requests)
        n_conns = srv.connections_opened

    assert via_corpus.order.to_pydict() == via_http.order.to_pydict()
    assert via_corpus.counts["seen"] == via_http.counts["seen"]
    # /dead 404s over HTTP exactly as it misses in the corpus
    assert via_corpus.counts["errored"] == via_http.counts["errored"] == 1
    assert "http://h1.ca/island" not in set(via_http.order["url"].to_pylist())
    # every crawled URL + the dead link hit the server at least once,
    # and keep-alive means connections stay below request count
    assert n_requests >= via_http.counts["seen"]
    assert n_conns <= n_requests


def test_non_200_status_quarantines(ray_session, tmp_path):
    """A URL the server answers with 500 is quarantined as errored,
    same as a 404 — the reference treats any non-200 as a failed fetch
    (responses.py:30-35)."""
    with CorpusHTTPServer(
        HTML, status_by_url={"http://h0.ca/c": 500}
    ) as srv:
        factory = make_http_fetcher_factory(resolve=LoopbackResolver(srv.port))
        res = run_crawl_with_fetcher(
            factory,
            ["http://h0.ca/a"],
            CrawlConfig(n_shards=2, max_depth=5, max_rounds=20),
        )
    urls = set(res.order["url"].to_pylist())
    assert "http://h0.ca/c" not in urls
    assert res.counts["errored"] == 2  # /dead (404) + /c (500)
    # /c's child h1.ca/y is still reachable via h1.ca/x -> /y
    assert "http://h1.ca/y" in urls


def test_politeness_delay_is_real_wall_time(ray_session):
    """host_delay_ms spaces a host's consecutive requests in observed
    server wall time; an interleaved second host needs no such gap
    (per-host, not global, delay)."""
    urls = [
        "http://slow.ca/p0",
        "http://fast.ca/q0",
        "http://slow.ca/p1",
        "http://fast.ca/q1",
        "http://slow.ca/p2",
    ]
    html = {u: "<html><body><main>x</main></body></html>" for u in urls}
    with CorpusHTTPServer(html) as srv:
        f = HttpFetcher(host_delay_ms=120, resolve=LoopbackResolver(srv.port))
        got = f.fetch(pa.array(urls, pa.string()))
        gaps = srv.request_gaps_by_host()
    assert got.num_rows == len(urls)
    assert len(gaps["slow.ca"]) == 2
    assert all(g >= 0.120 * 0.9 for g in gaps["slow.ca"])
    # the interleaved host was NOT forced to wait a full slow-host gap:
    # total wall time ~2 slow gaps, so fast.ca's one gap stays under it
    assert all(g < 0.120 * 2 for g in gaps["fast.ca"])


def test_one_keepalive_connection_per_host_per_session(ray_session):
    """The session contract: many fetches of one host through one
    HttpFetcher ride a single TCP connection (keep-alive reuse), and a
    second host gets its own single connection."""
    urls = [f"http://h0.ca/p{i}" for i in range(8)] + ["http://h1.ca/q"]
    html = {u: "<html><body><main>x</main></body></html>" for u in urls}
    with CorpusHTTPServer(html) as srv:
        f = HttpFetcher(resolve=LoopbackResolver(srv.port))
        f.fetch(pa.array(urls, pa.string()))
        f.fetch(pa.array(urls[:3], pa.string()))  # second round, same session
        assert srv.connections_opened == 2  # one per (scheme, netloc)
        assert len(srv.requests) == 12


def test_factory_memoizes_per_process(ray_session):
    """make_http_fetcher_factory returns the SAME fetcher instance on
    repeated calls in one process (per-worker session reuse across
    rounds) and distinct factories stay isolated."""
    fa = make_http_fetcher_factory(user_agent="a")
    fb = make_http_fetcher_factory(user_agent="b")
    assert fa() is fa()
    assert fb() is fb()
    assert fa() is not fb()
    assert fa().user_agent == "a" and fb().user_agent == "b"
