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
