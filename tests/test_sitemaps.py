"""Sitemap parsing beyond the oracle: namespace handling, index vs
leaf kinds, malformed-document tolerance, strict mode, and the
dataset-level flatten."""

import pytest
import ray.data

from louis_crawler_legacy_ray.sources.sitemaps import (
    parse_sitemap,
    sitemap_seeds,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_with_and_without_namespace():
    doc = (
        f"<urlset {NS}><url><loc> http://a/x </loc>"
        "<lastmod>2024-03-01</lastmod></url>"
        "<url><loc>http://a/y</loc></url></urlset>"
    )
    assert parse_sitemap(doc) == (
        "urlset",
        [
            ("http://a/x", "2024-03-01", None, None),
            ("http://a/y", None, None, None),
        ],
    )
    bare = "<urlset><url><loc>http://a/z</loc></url></urlset>"
    assert parse_sitemap(bare) == (
        "urlset", [("http://a/z", None, None, None)]
    )
    withp = (
        "<urlset><url><loc>http://a/p</loc><priority>0.80</priority>"
        "<changefreq>Daily</changefreq></url></urlset>"
    )
    # changefreq tokens normalize to lowercase; priority stays raw
    assert parse_sitemap(withp) == (
        "urlset", [("http://a/p", None, "0.80", "daily")]
    )


def test_sitemapindex_kind():
    doc = (
        f"<sitemapindex {NS}><sitemap><loc>http://a/s1.xml</loc>"
        "<lastmod>2024-01-02</lastmod></sitemap></sitemapindex>"
    )
    assert parse_sitemap(doc) == (
        "sitemapindex",
        [("http://a/s1.xml", "2024-01-02", None, None)],
    )


def test_malformed_and_foreign_documents():
    assert parse_sitemap("<urlset><url>") == ("invalid", [])
    assert parse_sitemap("<rss><item/></rss>") == ("invalid", [])
    assert parse_sitemap("") == ("invalid", [])
    # entries missing <loc> are skipped, unknown children ignored
    doc = "<urlset><url><lastmod>2024</lastmod></url><x/></urlset>"
    assert parse_sitemap(doc) == ("urlset", [])
    with pytest.raises(Exception):
        parse_sitemap("<urlset><url>", strict=True)
    with pytest.raises(ValueError):
        parse_sitemap("<rss/>", strict=True)


def test_dataset_flatten_mixed_kinds(ray_session):
    docs = [
        {"xml": "<urlset><url><loc>http://a/1</loc></url></urlset>"},
        {"xml": "<sitemapindex><sitemap><loc>http://a/more.xml</loc>"
                "</sitemap></sitemapindex>"},
        {"xml": "not xml at all"},  # contributes zero rows
    ]
    rows = sorted(
        sitemap_seeds(ray.data.from_items(docs)).take_all(),
        key=lambda r: r["url"],
    )
    assert [(r["url"], r["kind"]) for r in rows] == [
        ("http://a/1", "url"),
        ("http://a/more.xml", "sitemap"),
    ]


def test_sitemaps_in_robots():
    from louis_crawler_legacy_ray.state.politeness import sitemaps_in_robots

    txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: http://a/s1.xml\n"
        "SITEMAP: http://a/s2.xml  # trailing comment\n"
        "Sitemap: http://a/s1.xml\n"  # duplicate dropped
        "Sitemap:\n"  # empty value skipped
        "# Sitemap: http://a/commented.xml\n"
    )
    assert sitemaps_in_robots(txt) == ["http://a/s1.xml", "http://a/s2.xml"]
    assert sitemaps_in_robots("") == []


def test_priority_scores_from_seeds_defaults(ray_session):
    """<priority> resolves to round(p*100); absent/garbage tags take
    the sitemaps.org default 0.5 -> 50; index rows are ignored."""
    import pyarrow as pa

    from louis_crawler_legacy_ray.sources.sitemaps import (
        priority_scores_from_seeds,
        sitemap_seeds,
    )

    docs = [
        {"xml": (
            "<urlset>"
            "<url><loc>http://a/hi</loc><priority>0.93</priority></url>"
            "<url><loc>http://a/lo</loc><priority>0.07</priority></url>"
            "<url><loc>http://a/none</loc></url>"
            "<url><loc>http://a/bad</loc><priority>zzz</priority></url>"
            "</urlset>"
        )},
        {"xml": "<sitemapindex><sitemap><loc>http://a/s.xml</loc>"
                "</sitemap></sitemapindex>"},
    ]
    seeds = sitemap_seeds(ray.data.from_items(docs))
    scores = priority_scores_from_seeds(seeds)
    assert scores == {
        "http://a/hi": 93,
        "http://a/lo": 7,
        "http://a/none": 50,
        "http://a/bad": 50,
    }


def test_feed_parser_known_answers():
    """parse_feed: RFC-822 month decode, Atom href extraction, and
    unknown-root tolerance pinned on literal wire-format inputs."""
    from louis_crawler_legacy_ray.sources.feeds import parse_feed, rfc822_date
    import datetime

    rss = (
        '<rss version="2.0"><channel><title>h</title>'
        "<item><link>http://h/a</link>"
        "<pubDate>Tue, 31 Dec 2024 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    assert parse_feed("h", rss) == [
        {"host": "h", "fmt": "rss", "url": "http://h/a", "pub_date": "2024-12-31"}
    ]
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><link href="http://h/b"/>'
        "<updated>2024-02-29T00:00:00Z</updated></entry></feed>"
    )
    assert parse_feed("h", atom) == [
        {"host": "h", "fmt": "atom", "url": "http://h/b", "pub_date": "2024-02-29"}
    ]
    assert parse_feed("h", "<html>not a feed</html>") == []
    # rfc822_date is its own inverse through the parser's decode
    d = datetime.date(2026, 8, 20)
    assert rfc822_date(d) == "Thu, 20 Aug 2026 00:00:00 GMT"
