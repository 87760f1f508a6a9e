"""In-process loopback HTTP server serving a pages corpus.

Closes the last untested seam between the engine and a real crawl
(VERDICT r3 'Next round' #1): `stages.fetch.HttpFetcher` needs an
actual HTTP endpoint, and this sandbox has no network — so the corpus
itself is served over 127.0.0.1 with VIRTUAL HOSTING by Host header
(one server impersonates every host in the corpus, the standard
name-based vhost scheme). The companion
:class:`~louis_crawler_legacy_ray.stages.fetch.HttpFetcher` ``resolve``
hook points all hosts' TCP connections at the loopback port while the
logical netloc rides the Host header, exactly like a forward proxy.

The server also records every request as (monotonic_ts, host, path)
so tests can assert REAL politeness wall-time gaps per host and
keep-alive connection reuse, not just result parity.

Single-node only by construction (tests + demos). A real deployment
replaces this with the open web; nothing else in the engine changes —
that is the point of the Fetcher seam.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class CorpusHTTPServer:
    """Serve ``html_by_url`` ({'http://host/path': html}) over loopback.

    * unknown (host, path) -> 404 (drives the quarantine path);
    * optional ``status_by_url`` overrides per-URL status codes;
    * ``requests`` is the thread-safe request log [(ts, host, path)];
    * HTTP/1.1 + Content-Length, so client keep-alive works and
      ``connections_opened`` counts distinct TCP sessions (asserting
      the one-session-per-worker contract).
    """

    def __init__(
        self,
        html_by_url: dict[str, str],
        status_by_url: dict[str, int] | None = None,
    ):
        self.html_by_url = html_by_url
        self.status_by_url = status_by_url or {}
        self.requests: list[tuple[float, str, str]] = []
        self.connections_opened = 0
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------
    def start(self) -> int:
        """Bind 127.0.0.1 on an ephemeral port; returns the port."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def setup(self):  # one TCP session accepted
                super().setup()
                with outer._lock:
                    outer.connections_opened += 1

            def do_GET(self):
                import time

                host = (self.headers.get("Host") or "").split(":")[0]
                with outer._lock:
                    outer.requests.append((time.monotonic(), host, self.path))
                url = f"http://{host}{self.path}"
                html = outer.html_by_url.get(url)
                status = outer.status_by_url.get(
                    url, 200 if html is not None else 404
                )
                body = (html or "not here").encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, fmt, *args):  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, kwargs={"poll_interval": 0.05},
            daemon=True,
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "CorpusHTTPServer":
        self.port = self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- log views ---------------------------------------------------
    def request_gaps_by_host(self) -> dict[str, list[float]]:
        """Per host: gaps (seconds) between consecutive requests, in
        arrival order — the politeness-delay observable."""
        with self._lock:
            reqs = list(self.requests)
        by_host: dict[str, list[float]] = {}
        for ts, host, _path in reqs:
            by_host.setdefault(host, []).append(ts)
        return {
            h: [b - a for a, b in zip(ts, ts[1:])] for h, ts in by_host.items()
        }


class LoopbackResolver:
    """Picklable HttpFetcher ``resolve`` hook: every (scheme, netloc)
    connects to 127.0.0.1:port — the vhost-by-Host-header side of the
    loopback scheme. Ships to Ray fetch tasks as plain data."""

    def __init__(self, port: int):
        self.port = port

    def __call__(self, scheme: str, netloc: str) -> tuple[str, int]:
        return ("127.0.0.1", self.port)
