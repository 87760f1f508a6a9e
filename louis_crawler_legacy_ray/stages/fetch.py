"""Injectable fetcher seam (VERDICT r1 'Next round' #8).

The crawl's "fetch" step is pluggable: the frontier hands a selected
(url, depth) table to a *fetcher* and gets back a pages table
``(url, html)`` containing the successfully fetched subset. URLs absent
from the result are quarantined by the round's finish phase — exactly
the reference's 404 path (responses.py:30-35).

Implementations:

* the default corpus semi-join (pipelines/crawl.py pages_expand) — the
  in-sandbox stand-in for the network, like the reference goldie's disk
  cache (middlewares.py:102-117);
* :class:`DictFetcher` — an in-memory fake for tests;
* a real HTTP / browser session would be another Fetcher whose
  ``__init__`` opens the session once per worker — mirroring the
  reference's one-Playwright-browser-per-worker middleware
  (playwright_middleware.py:48-63). The factory runs inside the fetch
  task's worker process, so session state is per-worker, never pickled
  through the driver. Not constructible in this sandbox (no network);
  the seam is the contract.

A *fetcher factory* is a zero-arg picklable callable returning a
Fetcher; it is invoked inside each fetch task (Ray reuses worker
processes, so factories may memoize per-process for session reuse).
"""

from __future__ import annotations

import pyarrow as pa


class Fetcher:
    """Protocol: fetch(urls) -> pages table (url: string, html: string)
    for the successfully fetched subset, any order."""

    def fetch(self, urls: pa.Array) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def _default_needs_js(html: str) -> bool:
    """The M12 routing heuristic over raw html (reference
    base_playwright.py:225-272; column variant: stages/jsneed.py)."""
    from .jsneed import JS_FRAMEWORKS, LOADING_PATTERNS, MIN_TEXT_CHARS

    low = (html or "").lower()
    return (
        len(low) < MIN_TEXT_CHARS
        or any(p in low for p in LOADING_PATTERNS)
        or any(f in low for f in JS_FRAMEWORKS)
    )


class RoutingFetcher(Fetcher):
    """The reference's smart dual-path routing (SmartPlaywrightSpider,
    base_playwright.py:185-272): try the cheap ``regular`` fetcher
    first; pages the M12 classifier flags as needing JavaScript are
    refetched through the expensive ``js`` fetcher, and the URL's
    routing class is remembered for the rest of this worker's life
    (playwright_urls / regular_urls sets) so known-JS pages skip the
    wasted regular attempt."""

    def __init__(self, regular: Fetcher, js: Fetcher, needs_js=None):
        self.regular = regular
        self.js = js
        self.needs_js = needs_js or _default_needs_js
        self.playwright_urls: set[str] = set()
        self.regular_urls: set[str] = set()

    def fetch(self, urls: pa.Array) -> pa.Table:
        url_list = urls.to_pylist()
        known_js = [u for u in url_list if u in self.playwright_urls]
        rest = [u for u in url_list if u not in self.playwright_urls]
        parts: list[pa.Table] = []
        if rest:
            got = self.regular.fetch(pa.array(rest, pa.string()))
            keep_u, keep_h, retry = [], [], []
            for u, h in zip(got["url"].to_pylist(), got["html"].to_pylist()):
                if u in self.regular_urls or not self.needs_js(h):
                    self.regular_urls.add(u)
                    keep_u.append(u)
                    keep_h.append(h)
                else:
                    self.playwright_urls.add(u)
                    retry.append(u)
            parts.append(
                pa.table(
                    {
                        "url": pa.array(keep_u, pa.string()),
                        "html": pa.array(keep_h, pa.string()),
                    }
                )
            )
            known_js.extend(retry)
        if known_js:
            parts.append(self.js.fetch(pa.array(known_js, pa.string())))
        if not parts:
            return pa.table(
                {"url": pa.array([], pa.string()), "html": pa.array([], pa.string())}
            )
        return pa.concat_tables(parts)


class DictFetcher(Fetcher):
    """In-memory fake: url -> html dict (tests swap this in to prove
    the seam; missing urls are simply not returned = fetch failure)."""

    def __init__(self, pages_by_url: dict[str, str]):
        self.pages_by_url = pages_by_url

    def fetch(self, urls: pa.Array) -> pa.Table:
        got_urls: list[str] = []
        got_html: list[str] = []
        for u in urls.to_pylist():
            html = self.pages_by_url.get(u)
            if html is not None:
                got_urls.append(u)
                got_html.append(html)
        return pa.table(
            {
                "url": pa.array(got_urls, pa.string()),
                "html": pa.array(got_html, pa.string()),
            }
        )
