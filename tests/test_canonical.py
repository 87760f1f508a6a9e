"""rel=canonical extraction kernel (the consolidation GROUPING is
hash-gated end-to-end by the canonical_consolidate oracle)."""

from louis_crawler_legacy_ray.functions.html_kernels import canonical_target


def test_canonical_kernel():
    u = "http://inspection.canada.ca/en/s/doc1"
    assert (
        canonical_target(
            u, '<link rel="canonical" href="http://inspection.canada.ca/en/s/doc0">'
        )
        == "http://inspection.canada.ca/en/s/doc0"
    )
    # relative hrefs absolutize against the page URL
    assert canonical_target(u, "<link rel='canonical' href='/en/s/doc0'>") == (
        "http://inspection.canada.ca/en/s/doc0"
    )
    # attribute order swapped
    assert canonical_target(u, '<link href="/b" rel="canonical">') == (
        "http://inspection.canada.ca/b"
    )
    # absent / other link rels don't match
    assert canonical_target(u, "<html></html>") is None
    assert canonical_target(u, '<link rel="stylesheet" href="/s.css">') is None


def test_hreflang_alternates_kernel():
    from louis_crawler_legacy_ray.functions.html_kernels import (
        hreflang_alternates,
    )

    h = (
        '<head><link rel="alternate" hreflang="FR" href="/fra/a/doc1">'
        '<link rel="alternate" hreflang="de" '
        'href="http://inspection.canada.ca/de/a/doc2">'
        '<link rel="alternate" hreflang="es" href="/files/report.pdf">'
        "</head>"
    )
    got = hreflang_alternates("http://inspection.canada.ca/en/a/doc0", h)
    # multi-match in document order; hreflang lowercased; filtered
    # targets (pdf) dropped like frontier links
    assert got == [
        ("fr", "http://inspection.canada.ca/fra/a/doc1"),
        ("de", "http://inspection.canada.ca/de/a/doc2"),
    ]
    assert hreflang_alternates("http://x/a", "<head></head>") == []


def test_soft404_flags_planted_error_pages(ray_session):
    """The soft-404 detector flags exactly the doc_id % 13 == 0 pages
    whose body was swapped for the 200-status error template, and the
    phrase count is 3 (all lexicon phrases present once)."""
    import re

    from louis_crawler_legacy_ray.pipelines.queries import q_soft404

    df = q_soft404("/root/testdata/sf0.001").to_pandas()
    rx = re.compile(r"doc(\d+)$")
    df["doc"] = [int(rx.search(u).group(1)) for u in df["url"]]
    planted = df[df["doc"] % 13 == 0]
    clean = df[df["doc"] % 13 != 0]
    assert planted["is_soft404"].all() and (planted["n_err_phrases"] == 3).all()
    assert not clean["is_soft404"].any()
    assert (clean["n_err_phrases"] == 0).all()
