"""Frontier knobs: hot-host salting (skew defusal), round_limit (the
reference's CLOSESPIDER page cap, O4), and both round fan-out modes."""

import pyarrow as pa
import pytest

from louis_crawler_legacy_ray.pipelines.crawl import (
    CrawlConfig,
    edges_expand,
    run_crawl,
    run_frontier,
    shard_of,
)
from louis_crawler_legacy_ray.sources.pages import (
    pages_from_documents,
    synth_documents,
    write_pages_parquet,
)


def test_salting_spreads_one_host():
    """Without salt, one host maps to one shard; with salt, its URLs
    spread over multiple shards (skew defusal, SURVEY §4)."""
    host = "hot.example.ca"
    urls = [f"http://{host}/p{i}" for i in range(200)]
    plain = {shard_of(u, host, 8, {}) for u in urls}
    assert len(plain) == 1
    salted = {shard_of(u, host, 8, {host: 4}) for u in urls}
    assert len(salted) > 1


def test_salted_crawl_same_seen_set(ray_session):
    """Salting changes the partitioning, never the crawl semantics."""
    edges = pa.table(
        {
            "src": ["http://hot.ca/a"] * 3 + ["http://hot.ca/b"],
            "dst": ["http://hot.ca/b", "http://hot.ca/c", "http://hot.ca/d", "http://hot.ca/e"],
        }
    )
    plain = run_frontier(
        edges_expand(edges), ["http://hot.ca/a"], CrawlConfig(n_shards=4, max_depth=5)
    )
    salted = run_frontier(
        edges_expand(edges),
        ["http://hot.ca/a"],
        CrawlConfig(n_shards=4, max_depth=5, hot_host_salt={"hot.ca": 4}),
    )
    assert set(plain.order["url"].to_pylist()) == set(salted.order["url"].to_pylist())
    assert plain.counts["seen"] == salted.counts["seen"]


def test_round_limit_caps_and_defers(ray_session, tmp_path):
    """round_limit caps each round's fetch batch; nothing is dropped
    (the reference's batch_size semantics, goldie_playwright_parallel
    _get_next_batch)."""
    docs = synth_documents(30, seed=9)
    pages = pages_from_documents(docs)
    d = str(tmp_path / "pages")
    write_pages_parquet(pages, d, rows_per_file=16)
    from louis_crawler_legacy_ray.sources.pages import lang_segment

    seed = f"http://inspection.canada.ca/{lang_segment(docs['lang'][0].as_py())}/{docs['source'][0].as_py()}/doc0"
    free = run_crawl(d, [seed], CrawlConfig(n_shards=2, max_depth=6, max_rounds=30))
    capped = run_crawl(
        d, [seed], CrawlConfig(n_shards=2, max_depth=6, max_rounds=60, round_limit=4)
    )
    assert set(capped.order["url"].to_pylist()) == set(free.order["url"].to_pylist())
    assert max(m["selected"] for m in capped.metrics) <= 4
    assert capped.rounds >= free.rounds


@pytest.mark.parametrize("fanout", ["dataset", "tasks"])
def test_fanout_modes_equivalent(ray_session, tmp_path, fanout):
    docs = synth_documents(40, seed=4)
    pages = pages_from_documents(docs)
    d = str(tmp_path / f"pages_{fanout}")
    write_pages_parquet(pages, d, rows_per_file=16)
    from louis_crawler_legacy_ray.sources.pages import lang_segment

    seed = f"http://inspection.canada.ca/{lang_segment(docs['lang'][0].as_py())}/{docs['source'][0].as_py()}/doc0"
    res = run_crawl(
        d,
        [seed],
        CrawlConfig(
            n_shards=2,
            max_depth=4,
            max_rounds=10,
            round_fanout=fanout,
            inline_round_threshold=0,  # force the distributed path
        ),
    )
    assert res.counts["seen"] == len(set(res.order["url"].to_pylist()))
    assert res.counts["seen"] > 1


def test_prime_keeps_one_block_per_bucket_file(ray_session, tmp_path):
    """Bucketed corpora with >= 2x-CPU files must prime WITHOUT a
    repartition (one block per bucket file): the repartition path
    transiently doubles the corpus in the object store, which is what
    tripped the r4 spill holdout's disk headroom."""
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        _PAGES_MAT,
        clear_pages_cache,
        prime_pages_cache,
    )
    from louis_crawler_legacy_ray.sources.pages import (
        pages_from_documents,
        synth_documents,
        write_pages_parquet,
    )

    docs = synth_documents(256, seed=7)
    pages = pages_from_documents(docs, pad_bytes=0, n_children=2)
    out = str(tmp_path / "bucketed")
    # rows_per_file=16 -> 16 bucket files >= 2 x the 4-CPU test session
    write_pages_parquet(pages, out, rows_per_file=16, bucket_by_url=True)
    clear_pages_cache()
    try:
        prime_pages_cache(out)
        info = _PAGES_MAT[out]
        n_files = 16
        assert info["n_buckets"] == n_files
        assert len(info["refs"]) == n_files  # one block per bucket file
        assert len(info["block_buckets"]) == n_files
        # every block's bucket set is exactly its own file's bucket
        assert sorted(min(s) for s in info["block_buckets"]) == list(range(n_files))
        assert all(len(s) == 1 for s in info["block_buckets"])
    finally:
        clear_pages_cache()


def test_deny_url_patterns_quarantine(ray_session):
    """Trap-guard regexes quarantine candidates at admission: denied
    URLs land in errored as trap_denied, are never fetched, and their
    subtrees stay unreachable through the denied edge."""
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    edges = pa.table(
        {
            "src": [
                "http://a.ca/root",
                "http://a.ca/root",
                "http://a.ca/cal?d=1",
                "http://a.ca/page",
            ],
            "dst": [
                "http://a.ca/cal?d=1",
                "http://a.ca/page",
                "http://a.ca/cal?d=2",
                "http://a.ca/leaf",
            ],
        }
    )
    res = run_frontier(
        edges_expand(edges),
        ["http://a.ca/root"],
        CrawlConfig(n_shards=2, max_depth=4, deny_url_patterns=[r"/cal\?"]),
    )
    urls = set(res.order["url"].to_pylist())
    assert urls == {"http://a.ca/root", "http://a.ca/page", "http://a.ca/leaf"}
    # d=1 quarantined at admission; d=2 only discoverable through the
    # denied page so it was never even seen
    assert res.counts["errored"] == 1

    # reason string on the shard itself
    import ray as _ray

    from louis_crawler_legacy_ray.state.seen import FrontierShard

    shard = FrontierShard.options(num_cpus=0).remote(
        0, deny_url_patterns=[r"/cal\?"]
    )
    added = _ray.get(
        shard.enqueue.remote(
            ["http://a.ca/cal?d=9", "http://a.ca/ok"], [1, 1], ["a.ca", "a.ca"]
        )
    )
    assert added == 1
    d = _ray.get(shard.dump.remote())
    err = dict(zip(d["errored"]["url"].to_pylist(), d["errored"]["error"].to_pylist()))
    assert err == {"http://a.ca/cal?d=9": "trap_denied"}
    _ray.kill(shard)
