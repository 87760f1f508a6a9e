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


def test_registered_domain_psl_algorithm():
    """PSL-lite kernel: exception > longest-match > default-'*' rule
    precedence, wildcard label consumption, case/trailing-dot folding,
    and None when the host IS a public suffix."""
    from louis_crawler_legacy_ray.functions.urls import registered_domain as rd

    assert rd("w.site.com") == "site.com"
    assert rd("x.y.co.uk") == "y.co.uk"          # 2-label suffix beats 'uk'
    assert rd("a.b.on.ca") == "b.on.ca"          # second-level country suffix
    assert rd("p.q.ck") == "p.q.ck"              # wildcard *.ck: q.ck is a PS
    assert rd("s.www.ck") == "www.ck"            # exception !www.ck wins
    assert rd("m.n.zz") == "n.zz"                # unknown TLD -> default rule
    assert rd("co.uk") is None                   # host IS a public suffix
    assert rd("ck") is None
    assert rd("EXAMPLE.CA.") == "example.ca"
    assert rd("deep.sub.name.github.io") == "name.github.io"
    assert rd("solo.net") == "solo.net"


def test_domain_budget_grouping_derivation():
    """The crawl gate's PSL-derived grouping: vhost pairs collapse to
    their registered domain; a host that is its own eTLD+1 stays
    ungrouped (private queue)."""
    from louis_crawler_legacy_ray.functions.urls import registered_domain
    from louis_crawler_legacy_ray.pipelines.queries import _DOM_HOSTS

    groups = {
        h: registered_domain(h)
        for h in _DOM_HOSTS
        if registered_domain(h) != h
    }
    assert groups == {
        "a.example.ca": "example.ca",
        "b.example.ca": "example.ca",
        "news.sample.on.ca": "sample.on.ca",
        "shop.sample.on.ca": "sample.on.ca",
        "www.demo.co.uk": "demo.co.uk",
        "blog.demo.co.uk": "demo.co.uk",
    }
    assert "solo.net" not in groups


def test_idna_host_kernel():
    from louis_crawler_legacy_ray.functions.urls import idna_host

    assert idna_host("BÜCHER.Example.CA") == "xn--bcher-kva.example.ca"
    assert idna_host("пример.com") == "xn--e1afmkfd.com"
    assert idna_host("plain.example.com.") == "plain.example.com"
    # already-punycode input passes through unchanged (idempotence)
    assert idna_host("xn--bcher-kva.example.ca") == "xn--bcher-kva.example.ca"
    assert idna_host(idna_host("façade.on.ca")) == idna_host("façade.on.ca")


def test_mime_sniff_kernels():
    """sniff_mime / sniff_charset: magic bytes, BOM precedence over
    meta, meta over utf-8 probe, jpeg/zip/gzip/atom arms the oracle
    query doesn't exercise."""
    from louis_crawler_legacy_ray.functions.mime import sniff_charset, sniff_mime

    assert sniff_mime(b"%PDF-1.7") == "application/pdf"
    assert sniff_mime(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
    assert sniff_mime(b"PK\x03\x04zip") == "application/zip"
    assert sniff_mime(b"\x1f\x8bgz") == "application/gzip"
    assert sniff_mime(b"GIF89a...") == "image/gif"
    assert sniff_mime(b"\n\t <!DOCTYPE HTML><html>") == "text/html"
    assert sniff_mime(b"<DIV>x</DIV>") == "text/html"
    assert sniff_mime(b'<?xml version="1.0"?><feed xmlns=""/>') == "application/atom+xml"
    assert sniff_mime(b'<?xml version="1.0"?><note/>') == "text/xml"
    assert sniff_mime(b"\xef\xbb\xbf[1,2]") == "application/json"
    assert sniff_mime(b"hello world") == "text/plain"

    # BOM beats meta beats probe
    assert (
        sniff_charset(b'\xef\xbb\xbf<meta charset="ISO-8859-1">') == "utf-8"
    )
    assert sniff_charset(b"<META CHARSET='Windows-1251'>") == "windows-1251"
    assert sniff_charset("é".encode("utf-8")) == "utf-8"
    assert sniff_charset("é".encode("latin-1")) == "windows-1252"
    assert sniff_charset(b"\xff\xfea\x00") == "utf-16le"
    assert sniff_charset(b"\xfe\xff\x00a") == "utf-16be"
