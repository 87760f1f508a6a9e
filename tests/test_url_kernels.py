"""URL kernel tests — mirror the reference's semantics for
requests.py:4-25 (extract_urls / fix_vhost) and goldie.py:22-35
(children with order-preserving dedup)."""

from louis_crawler_legacy_ray.functions.urls import (
    detect_language,
    extract_children,
    extract_links,
    fix_vhost,
    url_hash64,
    url_host,
)

BASE = "http://inspection.canada.ca/en/sec1/page1"


def test_fix_vhost_ordered_replaces():
    assert fix_vhost("https://inspection.gc.ca/x") == "http://inspection.canada.ca/x"
    # 'www.' breaks the first substring match, so the second replace fires
    assert fix_vhost("https://www.inspection.gc.ca/x") == "http://inspection.canada.ca/x"
    assert fix_vhost("http://other.example.com/a") == "http://other.example.com/a"


def test_extract_links_filters():
    hrefs = [
        "report.pdf",                    # dropped: pdf
        "http://a.ca/doc.pdf",           # dropped: pdf
        "http://a.ca/page#frag",         # fragment stripped
        "http://a.ca/page?q=1",          # query stripped
        "/en/child",                     # site-relative resolved
        "relative/path",                 # dropped: relative
        "mailto:x@y.z",                  # dropped
        "javascript:void(0)",            # dropped
        "https://inspection.gc.ca/en/x", # canonicalized
    ]
    out = extract_links(hrefs, BASE)
    assert out == [
        "http://a.ca/page",
        "http://a.ca/page",
        "http://inspection.canada.ca/en/child",
        "http://inspection.canada.ca/en/x",
    ]


def test_extract_children_dedup_order():
    hrefs = ["/b", "#top", "mailto:a@b.c", "/a", "/b", "http://x.ca/c", "/a"]
    out = extract_children(hrefs, BASE)
    assert out == [
        "http://inspection.canada.ca/b",
        "http://inspection.canada.ca/a",
        "http://x.ca/c",
    ]


def test_extract_children_domain_filter():
    hrefs = ["/a", "http://evil.example.com/x", "http://sub.inspection.canada.ca/y"]
    out = extract_children(hrefs, BASE, allowed_domains=["inspection.canada.ca"])
    assert out == [
        "http://inspection.canada.ca/a",
        "http://sub.inspection.canada.ca/y",
    ]


def test_detect_language():
    assert detect_language("http://inspection.canada.ca/fra/x") == "fr"
    assert detect_language("http://inspection.canada.ca/en/x") == "en"


def test_hash_and_host_stable():
    assert url_host("http://a.ca:8080/x") == "a.ca:8080"
    h = url_hash64("http://a.ca/x")
    assert h == url_hash64("http://a.ca/x")
    assert 0 <= h < 2**64
    assert h != url_hash64("http://a.ca/y")


def test_surt_canonical_key():
    from louis_crawler_legacy_ray.functions.urls import surt

    assert surt("http://h3.example.ca/fra/src1/doc42") == (
        "ca,example,h3)/fra/src1/doc42"
    )
    # scheme dropped, case folded, www. stripped, query kept
    assert surt("https://WWW.Example.COM/A/B?q=1") == "com,example)/a/b?q=1"
    # bare host -> trailing slash form; domain pages sort contiguously
    assert surt("http://example.com") == "com,example)/"
    assert surt("") == ")/"
    a = surt("http://a.example.com/z")
    b = surt("http://b.example.com/a")
    assert a < b  # same domain groups before the next subdomain
