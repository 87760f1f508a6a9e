"""Payload MIME-type and charset sniffing (WHATWG mime-sniffing core
magic-byte patterns + BOM / html ``<meta charset>`` detection).

The reference assumes every fetched body is html (its pipeline hands
``response.text`` straight to BeautifulSoup —
louis/crawler/spiders/goldie.py parse path); a 100 TB crawl cannot: the
fetch stage must ROUTE payloads by sniffed type — html to the extract
kernel, pdf/image to the binary sink, json/xml feeds to their parsers —
without trusting the server's Content-Type header (routinely wrong in
web archives). Both kernels are pure bytes -> str functions usable
inside ``map_batches`` at full batch rate.
"""

from __future__ import annotations

import re

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16le"),
    (b"\xfe\xff", "utf-16be"),
)

_MAGIC = (
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
)

_HTML_PREFIXES = (
    b"<!doctype html",
    b"<html",
    b"<head",
    b"<body",
    b"<script",
    b"<iframe",
    b"<h1",
    b"<div",
    b"<p>",
    b"<p ",
)

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_.:-]+)""", re.IGNORECASE
)


def _strip_bom(body: bytes) -> bytes:
    for bom, _ in _BOMS:
        if body.startswith(bom):
            return body[len(bom) :]
    return body


def sniff_mime(body: bytes) -> str:
    """Sniffed MIME type of a payload: magic bytes first, then
    whitespace-tolerant html tag detection (case-insensitive), xml
    root dispatch (rss/atom/generic), a leading ``{``/``[`` as json,
    text/plain otherwise."""
    for magic, mime in _MAGIC:
        if body.startswith(magic):
            return mime
    text = _strip_bom(body).lstrip(b" \t\r\n")
    low = text[:256].lower()
    for p in _HTML_PREFIXES:
        if low.startswith(p):
            return "text/html"
    if low.startswith(b"<?xml"):
        if b"<rss" in low:
            return "application/rss+xml"
        if b"<feed" in low:
            return "application/atom+xml"
        return "text/xml"
    if low.startswith(b"{") or low.startswith(b"["):
        return "application/json"
    return "text/plain"


def sniff_charset(body: bytes) -> str:
    """Charset of a TEXT payload: BOM wins; else an html
    ``<meta charset=...>`` in the first 1024 bytes; else utf-8 if the
    bytes decode as utf-8, windows-1252 as the legacy fallback
    (WHATWG's default for unlabeled non-utf-8 content)."""
    for bom, name in _BOMS:
        if body.startswith(bom):
            return name
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"
