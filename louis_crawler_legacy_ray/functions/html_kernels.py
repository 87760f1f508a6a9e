"""Page extraction kernels — the byte-identity-critical transforms.

Reproduces the goldie extraction profile (the one the reference's golden
tests pin, tests/test_goldie.py:35-86):

  - ``clean_html``      -> louis/crawler/spiders/goldie.py:47-61 (M4)
  - ``extract_title``   -> goldie.py:11-12 (M6)
  - ``extract_last_updated`` -> goldie.py:13 (M7)
  - ``extract_page``    -> goldie.py:10-45 (convert_to_crawl_item)

Pure functions over HTML strings; the Ray stage maps them over Arrow
columns in stages/extract.py.
"""

from __future__ import annotations

import re

from .dom import Element, parse_html, strip_comments
from .urls import detect_language, extract_children, extract_links, fix_vhost

_WS_RE = re.compile(r"\s+")

# selectors dropped from <main> before serialization (goldie.py:49-53)
_NOISE_TAGS = ("aside", "script")
_NOISE_CLASSES = ("pagedetails", "nojs-hide", "alert")


def normalize_ws(s: str) -> str:
    """``re.sub(r'\\s+', ' ', s).strip()`` — the reference's whitespace
    normalizer, applied to titles, cleaned html and chunk text
    (goldie.py:12,61, chunking.py:24). Semantics-bearing (M10)."""
    return _WS_RE.sub(" ", s).strip()


def clean_html_playwright(html: str) -> str:
    """The M5 'playwright' cleaning profile (reference
    base_playwright.py:121-156): content-root fallbacks main -> article
    -> .content/#content/.main-content/#main-content -> whole document;
    extra drops (style, nav, header, footer); empty elements (no text,
    no <img>) removed. The goldie profile (:func:`clean_html`) is the
    canonical golden-tested one (SURVEY §2.2 M5 note); this variant is
    selectable via ``extract_page(profile='playwright')``."""
    doc = parse_html(html)
    root = doc.find("main") or doc.find("article")
    if root is None:
        root = doc.find(
            lambda e: e.has_class("content")
            or e.has_class("main-content")
            or e.attrs.get("id") in ("content", "main-content")
        )
    if root is None:
        root = doc
    for tag in ("aside", "script", "style", "nav", "header", "footer"):
        for el in root.find_all(tag):
            el.extract()
    for cls in ("pagedetails", "nojs-hide", "alert"):
        for el in root.select_class(cls):
            el.extract()
    strip_comments(root if root.name != "[document]" else root)
    # remove empty elements (no stripped text, no img descendant)
    for el in list(root.iter_elements()):
        if el.parent is None:
            continue
        if not el.get_text().strip() and el.find("img") is None and el.name != "img":
            el.extract()
    inner = root.inner_html() if root.name == "[document]" else root.to_html()
    return normalize_ws("<html><body>" + inner + "</body></html>")


def clean_html(html: str) -> str:
    """Clean a page to its <main> content (goldie.py:47-61):

    1. select the first <main> element;
    2. drop aside, .pagedetails, script, .nojs-hide, .alert subtrees;
    3. strip HTML comments;
    4. serialize, wrapped in <html><body>...</body></html> — mirroring
       BeautifulSoup(main_html, 'lxml')'s document promotion, whose
       ``str(soup)`` output starts '<html><body><main...' ;
    5. collapse whitespace runs to single spaces and strip.

    Returns '' when the page has no <main> (reference raises there; our
    synthetic corpus always has one — '' marks malformed input as data,
    not fault).
    """
    return clean_doc(parse_html(html))


def clean_doc(doc: Element) -> str:
    """clean_html over an already-parsed document — one traversal to
    collect the noise subtrees, comments skipped during serialization
    (identical output, ~half the kernel cost of re-walking per
    selector)."""
    main = doc.find("main")
    if main is None:
        return ""
    noise = [
        el
        for el in main.iter_elements()
        if el.name in _NOISE_TAGS
        or any(c in _NOISE_CLASSES for c in el.classes())
    ]
    for el in noise:
        if el.parent is not None:
            el.extract()
    content = "<html><body>" + main.to_html(skip_comments=True) + "</body></html>"
    return normalize_ws(content)


def extract_title(doc: Element) -> str:
    """Join ALL //title/text() with ' ', collapse whitespace
    (goldie.py:11-12)."""
    titles = [t.get_text() for t in doc.find_all("title")]
    return normalize_ws(" ".join(titles))


def extract_last_updated(doc: Element):
    """First //time/text() or None (goldie.py:13)."""
    t = doc.find("time")
    return t.get_text() if t is not None else None


def extract_hrefs(doc: Element) -> list[str]:
    """All a::attr(href) in document order (goldie.py:23, requests.py:5)."""
    return [a.attrs["href"] for a in doc.find_all("a") if "href" in a.attrs and isinstance(a.attrs["href"], str)]


def extract_page(
    url: str,
    html: str,
    now: int = 0,
    allowed_domains: list[str] | None = None,
    profile: str = "goldie",
) -> dict:
    """Full goldie ``convert_to_crawl_item`` (goldie.py:10-45) plus the
    M2 link set used for new frontier requests (requests.py:4-20).

    ``now`` is the injected clock (deterministic in tests; reference
    uses int(time.time()), goldie.py:16).

    Returns one record dict with both ``children`` (M3 list, stored on
    the item) and ``links`` (M2 filtered+canonicalized URLs that become
    new frontier candidates).
    """
    # ONE parse per page: field extraction in a single traversal, then
    # cleaning mutates the same tree (the reference re-selects from one
    # parsed response too; re-parsing html per kernel doubled the cost)
    doc = parse_html(html)
    titles: list[str] = []
    first_time = None
    hrefs: list[str] = []
    for el in doc.iter_elements():
        if el.name == "title":
            titles.append(el.get_text())
        elif el.name == "time" and first_time is None:
            first_time = el.get_text()
        elif el.name == "a":
            href = el.attrs.get("href")
            if isinstance(href, str):
                hrefs.append(href)
    title = normalize_ws(" ".join(titles))
    last_updated = first_time
    canon_url = fix_vhost(url)
    if profile == "goldie":
        cleaned = clean_doc(doc)
    else:
        cleaned = clean_html_playwright(html)
    return {
        "url": canon_url,
        "title": title,
        "lang": detect_language(canon_url),
        "html_content": cleaned,
        "last_crawled": now,
        "last_updated": last_updated,
        "children": extract_children(hrefs, url, allowed_domains),
        "links": extract_links(hrefs, url, allowed_domains),
        "redirect": meta_refresh_target(url, html, allowed_domains),
        "meta_robots": meta_robots(html),
        "canonical": canonical_target(url, html, allowed_domains),
    }


_META_REFRESH_RX = None


def meta_refresh_target(
    url: str, html: str, allowed_domains: list[str] | None = None
) -> str | None:
    """The page's ``<meta http-equiv="refresh" content="N;url=...">``
    target, absolutized + canonicalized EXACTLY like a frontier link
    candidate (extract_links rules) — the HTML-level stand-in for an
    HTTP 3xx in a corpus of stored bodies. None when the page has no
    refresh directive or its target is filtered (pdf/mailto/#/…)."""
    import re as _re

    global _META_REFRESH_RX
    if _META_REFRESH_RX is None:
        _META_REFRESH_RX = _re.compile(
            r"<meta\s+http-equiv=[\"']refresh[\"']\s+"
            r"content=[\"']\s*\d+\s*;\s*url=([^\"'>]+)[\"']",
            _re.IGNORECASE,
        )
    m = _META_REFRESH_RX.search(html or "")
    if not m:
        return None
    links = extract_links([m.group(1).strip()], url, allowed_domains)
    return links[0] if links else None


_CANONICAL_RX = None


def canonical_target(
    url: str, html: str, allowed_domains: list[str] | None = None
) -> str | None:
    """The page's ``<link rel="canonical" href="...">`` target — the
    indexing-side duplicate-consolidation hint (it does NOT steer the
    frontier; crawling is governed by robots, canonical by the
    indexer). Absolutized + canonicalized EXACTLY like a frontier link
    candidate so group keys agree with crawled URLs; None when absent
    or filtered. Either attribute order matches."""
    import re as _re

    global _CANONICAL_RX
    if _CANONICAL_RX is None:
        _CANONICAL_RX = _re.compile(
            r"<link\s+(?:rel=[\"']canonical[\"']\s+href=[\"']([^\"'>]+)[\"']"
            r"|href=[\"']([^\"'>]+)[\"']\s+rel=[\"']canonical[\"'])",
            _re.IGNORECASE,
        )
    m = _CANONICAL_RX.search(html or "")
    if not m:
        return None
    links = extract_links(
        [(m.group(1) or m.group(2)).strip()], url, allowed_domains
    )
    return links[0] if links else None


_META_ROBOTS_RX = None


def meta_robots(html: str) -> str:
    """The page-level robots directives from ``<meta name="robots"
    content="...">`` (the Robots Exclusion Protocol's HTML companion:
    robots.txt governs FETCHING, the meta tag governs what a crawler
    does with a page it already fetched). Returns the canonical subset
    string — '' / 'noindex' / 'nofollow' / 'noindex,nofollow' —
    case-insensitively; the ``none`` token means both, matching the
    de-facto Googlebot/Scrapy reading. Attribute order ``name`` first
    or ``content`` first both match (regex scan like meta_refresh —
    one cheap pass, no extra DOM walk)."""
    import re as _re

    global _META_ROBOTS_RX
    if _META_ROBOTS_RX is None:
        _META_ROBOTS_RX = _re.compile(
            r"<meta\s+(?:name=[\"']robots[\"']\s+content=[\"']([^\"'>]*)[\"']"
            r"|content=[\"']([^\"'>]*)[\"']\s+name=[\"']robots[\"'])",
            _re.IGNORECASE,
        )
    m = _META_ROBOTS_RX.search(html or "")
    if not m:
        return ""
    toks = {
        t.strip().lower()
        for t in (m.group(1) or m.group(2) or "").split(",")
    }
    noindex = "noindex" in toks or "none" in toks
    nofollow = "nofollow" in toks or "none" in toks
    return ",".join(
        d for d, on in (("noindex", noindex), ("nofollow", nofollow)) if on
    )


def extract_anchors(url: str, html: str) -> list[tuple[str, str]]:
    """(absolute_link, anchor_text) pairs of a page — the web-graph
    anchor-text signal (the reference extracts hrefs only, goldie.py:23;
    anchor text is the classic ranking/describe-the-target feature this
    engine adds for link-graph analytics). One parse; links filtered +
    absolutized + canonicalized EXACTLY like the frontier candidates
    (extract_links rules: pdf/#/?/mailto handling, fix_vhost), anchor
    text whitespace-normalized. One pair per link occurrence — a page
    linking the same target under two texts contributes both."""
    doc = parse_html(html)
    out: list[tuple[str, str]] = []
    for a in doc.find_all("a"):
        href = a.attrs.get("href")
        if not isinstance(href, str):
            continue
        links = extract_links([href], url)
        if links:
            out.append((links[0], normalize_ws(a.get_text())))
    return out


_HREFLANG_RX = None


def hreflang_alternates(
    url: str, html: str, allowed_domains: list[str] | None = None
) -> list[tuple[str, str]]:
    """ALL ``<link rel="alternate" hreflang="xx" href="...">``
    declarations of a page as (hreflang, absolute_url) pairs in
    document order — the SEO-standard language-variant clustering hint
    (Google's rel-alternate-hreflang): the indexer groups the variants
    under one cluster and serves the language-matched member. Targets
    absolutized + filtered EXACTLY like frontier links so cluster keys
    agree with crawled URLs; filtered targets are dropped. Matches the
    canonical attribute order (rel, hreflang, href); a multi-match scan
    unlike canonical_target/meta_refresh (a page declares one variant
    per language)."""
    import re as _re

    global _HREFLANG_RX
    if _HREFLANG_RX is None:
        _HREFLANG_RX = _re.compile(
            r"<link\s+rel=[\"']alternate[\"']\s+"
            r"hreflang=[\"']([^\"'>]+)[\"']\s+href=[\"']([^\"'>]+)[\"']",
            _re.IGNORECASE,
        )
    out: list[tuple[str, str]] = []
    for m in _HREFLANG_RX.finditer(html or ""):
        links = extract_links([m.group(2).strip()], url, allowed_domains)
        if links:
            out.append((m.group(1).strip().lower(), links[0]))
    return out
