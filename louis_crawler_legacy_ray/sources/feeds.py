"""RSS 2.0 / Atom feed discovery source.

Feeds are the push-channel complement of sitemaps (sources/sitemaps.py)
for crawl scheduling: a host's feed lists its most-recently-published
URLs, so a crawler that polls feeds discovers fresh pages without
re-walking the site. The reference crawls a fixed site with no feed
support (louis/crawler/spiders/goldie.py walks links only); this module
extends the engine with the standard discovery convention, mirroring
the sitemap source's shape: XML synthesis happens host-grouped upstream,
parsing is a stateless distributed flat map over (host, xml) rows.

Both wire formats are parsed with the stdlib only (no feedparser in the
environment): RSS 2.0 ``<item><link>…</link><pubDate>RFC-822</pubDate>``
and Atom ``<entry><link href="…"/><updated>ISO-8601</updated>``. Dates
normalize to ISO ``YYYY-MM-DD`` so downstream scheduling (and the
DuckDB oracle) never touches locale-dependent month names.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

_ITEM_RE = re.compile(r"<item>(.*?)</item>", re.S)
_ENTRY_RE = re.compile(r"<entry>(.*?)</entry>", re.S)
_LINK_RE = re.compile(r"<link>(.*?)</link>", re.S)
_HREF_RE = re.compile(r'<link\s+href="([^"]*)"')
_PUBDATE_RE = re.compile(r"<pubDate>(.*?)</pubDate>", re.S)
_UPDATED_RE = re.compile(r"<updated>(.*?)</updated>", re.S)

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()
    )
}

_DAYS = "Mon Tue Wed Thu Fri Sat Sun".split()


def rfc822_date(d) -> str:
    """datetime.date -> 'Mon, 12 Feb 2024 00:00:00 GMT' without any
    locale dependence (RSS 2.0 pubDate wire format)."""
    day = _DAYS[d.weekday()]
    mon = [k for k, v in _MONTHS.items() if v == d.month][0]
    return f"{day}, {d.day:02d} {mon} {d.year} 00:00:00 GMT"


def _rfc822_to_iso(s: str) -> str:
    # 'Mon, 12 Feb 2024 00:00:00 GMT' -> '2024-02-12'; RFC 822 makes the
    # leading weekday token OPTIONAL, so '12 Feb 2024 00:00:00 GMT' is
    # equally legal — index relative to where the day-of-month starts.
    parts = s.split()
    off = 1 if parts and parts[0].endswith(",") else 0
    return (
        f"{int(parts[off + 2]):04d}-{_MONTHS[parts[off + 1]]:02d}"
        f"-{int(parts[off]):02d}"
    )


def parse_feed(host: str, xml: str) -> list[dict]:
    """Parse one feed document into item dicts. Format is sniffed from
    the root element; unknown roots yield no items (a crawler skips
    what it cannot parse, it does not crash the batch)."""
    out: list[dict] = []
    if "<rss" in xml[:256]:
        for body in _ITEM_RE.findall(xml):
            link = _LINK_RE.search(body)
            pub = _PUBDATE_RE.search(body)
            if link and pub:
                try:
                    iso = _rfc822_to_iso(pub.group(1).strip())
                except (ValueError, KeyError, IndexError):
                    continue  # malformed date: skip the item, not the batch
                out.append(
                    {
                        "host": host,
                        "fmt": "rss",
                        "url": link.group(1).strip(),
                        "pub_date": iso,
                    }
                )
    elif "<feed" in xml[:256]:
        for body in _ENTRY_RE.findall(xml):
            link = _HREF_RE.search(body)
            upd = _UPDATED_RE.search(body)
            if link and upd:
                out.append(
                    {
                        "host": host,
                        "fmt": "atom",
                        "url": link.group(1),
                        "pub_date": upd.group(1)[:10],
                    }
                )
    return out


def feed_items(feeds: ray.data.Dataset) -> ray.data.Dataset:
    """Distributed parse of (host, xml) feed rows into
    (host, fmt, url, pub_date) item rows — a stateless flat map; a
    feed document is one row, so no shuffle is needed to parse it."""

    def parse_batch(b: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for host, xml in zip(b["host"].to_pylist(), b["xml"].to_pylist()):
            rows.extend(parse_feed(host, xml))
        return pa.table(
            {
                "host": pa.array([r["host"] for r in rows], pa.string()),
                "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "pub_date": pa.array(
                    [r["pub_date"] for r in rows], pa.string()
                ),
            }
        )

    return feeds.map_batches(parse_batch, batch_format="pyarrow")
