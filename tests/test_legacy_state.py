"""Reference crawl-state file migration (sources/legacy_state.py):
parsing rules byte-for-byte with goldie_playwright_parallel.py's
loaders, reversible export, admission semantics on import, and the
headline property — a crawl migrated mid-run from the reference's
text files finishes EXACTLY like the uninterrupted crawl."""

from louis_crawler_legacy_ray.pipelines.crawl import (
    CrawlConfig,
    Frontier,
    pages_expand,
    run_crawl,
    run_frontier,
)
from louis_crawler_legacy_ray.sources.legacy_state import (
    export_legacy_state,
    import_legacy_state,
    read_errored_urls,
    read_pending_urls,
    read_scraped_urls,
    write_legacy_state,
)
from louis_crawler_legacy_ray.sources.pages import (
    lang_segment,
    pages_from_documents,
    synth_documents,
    write_pages_parquet,
)


def _corpus(tmp_path, n=120, seed=13):
    docs = synth_documents(n, seed=seed)
    pages = pages_from_documents(docs)
    d = str(tmp_path / "pages")
    write_pages_parquet(pages, d, rows_per_file=32)
    seed_url = (
        f"http://inspection.canada.ca/"
        f"{lang_segment(docs['lang'][0].as_py())}/{docs['source'][0].as_py()}/doc0"
    )
    return d, seed_url


def test_reference_parsing_rules(tmp_path):
    # mirror goldie_playwright_parallel.py:514-561 quirks exactly
    (tmp_path / "scraped_urls.txt").write_text(
        "http://a/x\n\n  http://a/y  \nhttp://a/x\n"
    )
    (tmp_path / "pending_urls.txt").write_text(
        "http://a/p|2\n"
        "http://a/q\n"  # no pipe -> depth 0
        "http://a/r|notanint\n"  # bad depth -> WHOLE line at depth 0
        "http://a/s|1|3\n"  # rsplit on LAST pipe
        "\n"
    )
    (tmp_path / "errored_urls.txt").write_text("http://a/e\n")
    assert read_scraped_urls(str(tmp_path / "scraped_urls.txt")) == {
        "http://a/x",
        "http://a/y",
    }
    assert read_pending_urls(str(tmp_path / "pending_urls.txt")) == {
        ("http://a/p", 2),
        ("http://a/q", 0),
        ("http://a/r|notanint", 0),
        ("http://a/s|1", 3),
    }
    assert read_errored_urls(str(tmp_path / "errored_urls.txt")) == {
        "http://a/e"
    }
    # missing files -> empty state, like the reference's first run
    assert read_scraped_urls(str(tmp_path / "nope.txt")) == set()
    assert read_pending_urls(str(tmp_path / "nope.txt")) == set()


def test_write_read_roundtrip(tmp_path):
    seen = {"http://a/1", "http://a/2"}
    pending = {("http://a/3", 1), ("http://a/4", 2)}
    errored = {"http://a/5"}
    paths = write_legacy_state(str(tmp_path / "st"), seen, pending, errored)
    assert read_scraped_urls(paths["scraped"]) == seen
    assert read_pending_urls(paths["pending"]) == pending
    assert read_errored_urls(paths["errored"]) == errored


def test_import_admission_rules(ray_session, tmp_path):
    cfg = CrawlConfig(n_shards=2, max_depth=5, max_rounds=5)
    fr = Frontier(cfg)
    try:
        counts = import_legacy_state(
            fr,
            seen={"http://h/a"},
            # a already seen -> dropped; b pending at two depths -> min
            pending={("http://h/a", 1), ("http://h/b", 2), ("http://h/b", 1)},
            errored={"http://h/c"},
        )
        assert counts == {"seen": 1, "pending": 1, "errored": 1}
        out = export_legacy_state(fr, str(tmp_path / "out"))
        assert read_scraped_urls(out["scraped"]) == {"http://h/a"}
        assert read_pending_urls(out["pending"]) == {("http://h/b", 1)}
        assert read_errored_urls(out["errored"]) == {"http://h/c"}
    finally:
        fr.release()


def test_migrate_and_resume_matches_uninterrupted(ray_session, tmp_path):
    d, seed_url = _corpus(tmp_path)
    full_cfg = CrawlConfig(n_shards=3, max_depth=8, max_rounds=64)
    full = run_crawl(d, [seed_url], full_cfg)
    full_rows = sorted(
        zip(
            full.order["round"].to_pylist(),
            full.order["depth"].to_pylist(),
            full.order["url"].to_pylist(),
        )
    )

    # phase 1: the "reference" ran the first 3 BFS rounds, then the
    # user exported its three state files and switched engines
    k = 3
    part_cfg = CrawlConfig(n_shards=3, max_depth=8, max_rounds=k)
    fr = Frontier(part_cfg)
    try:
        part = run_frontier(
            pages_expand(d, part_cfg, None, 0),
            [seed_url],
            part_cfg,
            frontier=fr,
        )
        paths = export_legacy_state(fr, str(tmp_path / "legacy"))
    finally:
        fr.release()
    part_rows = sorted(
        zip(
            part.order["round"].to_pylist(),
            part.order["depth"].to_pylist(),
            part.order["url"].to_pylist(),
        )
    )
    assert part_rows == [r for r in full_rows if r[0] < k]

    # phase 2: import the text files into a FRESH frontier and finish
    fr2 = Frontier(full_cfg)
    try:
        import_legacy_state(
            fr2,
            seen=read_scraped_urls(paths["scraped"]),
            pending=read_pending_urls(paths["pending"]),
            errored=read_errored_urls(paths["errored"]),
        )
        cont = run_frontier(
            pages_expand(d, full_cfg, None, 0), [], full_cfg, frontier=fr2
        )
    finally:
        fr2.release()
    cont_rows = sorted(
        zip(
            cont.order["round"].to_pylist(),
            cont.order["depth"].to_pylist(),
            cont.order["url"].to_pylist(),
        )
    )
    # the continued crawl IS the uninterrupted crawl's tail: same
    # (depth, url) schedule round by round, rounds renumbered from 0
    assert [(r + k, dep, u) for r, dep, u in cont_rows] == [
        r for r in full_rows if r[0] >= k
    ]
