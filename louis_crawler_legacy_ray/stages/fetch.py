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
