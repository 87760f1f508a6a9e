"""Sitemap ingestion — the standard seed-discovery channel
(sitemaps.org protocol: ``<urlset>`` leaf sitemaps and
``<sitemapindex>`` indexes of sitemaps).

The reference hardcodes its seed list (one start_url per spider,
goldie.py / goldie_playwright_parallel.py); a crawler operating on the
open web discovers most of its frontier through robots.txt-advertised
sitemaps instead. This source parses sitemap XML into (url, lastmod)
seed rows; lastmod feeds the recrawl scheduler's freshness signal and
the urls feed ``Frontier.enqueue_table`` as depth-0 seeds.

Parsing is stdlib xml.etree with namespace-agnostic tag matching
(real-world sitemaps ship with and without the 0.9 namespace, and
index files nest). A malformed document contributes zero rows rather
than failing the pipeline (one bad host must not kill a million-host
ingest); pass ``strict=True`` to raise instead.

Scale shape: one sitemap document is one row (host-sized, bounded at
50k urls by the protocol), so a ``flat_map``-style ``map_batches``
parse distributes naturally — no shuffle at all until the caller
dedups seeds against the seen-shards like any other candidate batch.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa
import ray.data


def _local(tag: str) -> str:
    """Tag name with any {namespace} prefix stripped."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(
    xml_text: str, strict: bool = False
) -> tuple[str, list[tuple[str, str | None, str | None, str | None]]]:
    """Parse one sitemap document.

    Returns ``(kind, entries)``: kind 'urlset' with (page url, lastmod
    or None, priority or None, changefreq or None) entries, kind
    'sitemapindex' with (child sitemap url, lastmod, None, None)
    entries, or ('invalid', []) for malformed/foreign XML.
    ``priority`` is the raw sitemaps.org string ("0.0".."1.0") and
    ``changefreq`` the raw token (always/hourly/.../never); defaults
    for absent tags are a CONSUMER choice
    (priority_scores_from_seeds / recrawl policies), not the
    parser's."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        if strict:
            raise
        return "invalid", []
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        if strict:
            raise ValueError(f"not a sitemap root: {root.tag}")
        return "invalid", []
    entries: list[tuple[str, str | None, str | None, str | None]] = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod, prio, cf = None, None, None, None
        for field in child:
            name = _local(field.tag)
            if name == "loc":
                loc = (field.text or "").strip()
            elif name == "lastmod":
                lastmod = (field.text or "").strip() or None
            elif name == "priority":
                prio = (field.text or "").strip() or None
            elif name == "changefreq":
                cf = (field.text or "").strip().lower() or None
        if loc:
            entries.append((loc, lastmod, prio, cf))
    return kind, entries


def sitemap_seeds(
    sitemaps: ray.data.Dataset, xml_col: str = "xml", strict: bool = False
) -> ray.data.Dataset:
    """Flatten a Dataset of sitemap documents into seed rows
    (url, lastmod). Index documents contribute their child-sitemap
    urls tagged kind='sitemap' so a driver loop can fetch-and-ingest
    the next level; leaf urls come out kind='url'."""

    def parse(b: pa.Table) -> pa.Table:
        urls: list[str] = []
        mods: list[str | None] = []
        prios: list[str | None] = []
        cfs: list[str | None] = []
        kinds: list[str] = []
        for doc in b[xml_col].to_pylist():
            kind, entries = parse_sitemap(doc or "", strict=strict)
            tag = "sitemap" if kind == "sitemapindex" else "url"
            for loc, lastmod, prio, cf in entries:
                urls.append(loc)
                mods.append(lastmod)
                prios.append(prio)
                cfs.append(cf)
                kinds.append(tag)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
                "priority": pa.array(prios, pa.string()),
                "changefreq": pa.array(cfs, pa.string()),
                "kind": pa.array(kinds, pa.string()),
            }
        )

    return sitemaps.map_batches(parse, batch_format="pyarrow")


def priority_scores_from_seeds(
    seeds: ray.data.Dataset, scale: int = 100, default: int = 50
) -> dict[str, int]:
    """Resolve sitemap ``<priority>`` strings into the INTEGER score
    map a ``priority='score_desc'`` crawl consumes (CrawlConfig.
    priority_scores) — round(priority * scale), protocol default 0.5
    for absent/garbage tags. Driver-side by design: the score map is
    crawl CONFIG (the Frontier slices it per owning shard), and a
    sitemap is protocol-capped at 50k urls per document."""
    out: dict[str, int] = {}
    for r in seeds.select_columns(["url", "priority", "kind"]).take_all():
        if r["kind"] != "url":
            continue
        try:
            p = float(r["priority"])
        except (TypeError, ValueError):
            p = default / scale
        out[r["url"]] = round(p * scale)
    return out
