"""Sharded frontier-state actors: URL-seen filter + pending queue +
errored quarantine + per-host politeness budget.

The reference keeps one in-memory seen/pending/errored set on the
driver, persisted to flat files (goldie_playwright_parallel.py:437-440,
514-578). That is the single-node bottleneck its own docs flag at 100k+
URLs (docs/parallel_spider_guide.md:407-410). Here the state is a
*partitioned service*: N ``FrontierShard`` actors, each owning the hash
range ``shard_id == blake2b64(host(url)) % N`` — sharding by HOST so a
host's pending URLs and its politeness budget are colocated in one
actor (north_rule: hash-partition by host; SURVEY §2.3 T4/T5).

URL lifecycle inside a shard (mirrors goldie_playwright_parallel.py
enqueue/take semantics, :606-664):

    enqueue(url, depth):  dropped if url ∈ seen ∪ errored ∪ pending
                          ∪ in_flight, else appended to pending
    take(...):            pending sorted by (depth, url); per-host
                          budget applied; selected move to in_flight
    settle(ok, bad):      in_flight -> seen (fetched) or errored

Memory modes:
  * ``exact``  — Python sets of URL strings (test scale; the semantics
    the reference's fixtures pin).
  * ``approx`` — the *membership* side (seen) additionally keeps a
    bloom front so the 10^10-URL design point fits: ~1.2 GB per shard
    at 10 bits/key for 10^9 keys/shard x 10 shards/node. At test scale
    exact backing stays on so answers are exact; at true scale the
    exact set would be dropped and the documented false-positive rate
    (~1%% at 10 bits/key) trades a tiny loss of recrawl coverage for
    memory — acceptable for a crawler seen-filter (skipping a few
    never-seen URLs), never for the correctness fixtures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray


def host_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).netloc


def shard_for_host(host: str, n_shards: int) -> int:
    h = int.from_bytes(hashlib.blake2b(host.encode(), digest_size=8).digest(), "big")
    return h % n_shards


class _Bloom:
    """Simple double-hash bloom filter over uint64 key hashes."""

    def __init__(self, n_bits: int = 1 << 24, k: int = 7):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, h: int) -> list[int]:
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        return [((h1 + i * h2) % self.n_bits) for i in range(self.k)]

    def add(self, h: int) -> None:
        for p in self._positions(h):
            self.bits[p >> 3] |= 1 << (p & 7)

    def maybe_contains(self, h: int) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(h))


@ray.remote(num_cpus=0)
class FrontierShard:
    """One hash-range shard of the frontier state service.

    Zero CPU reservation: the shard actors are lightweight set/dict
    services on the RPC path — any reservation starves the data-plane
    map tasks once n_shards x reservation approaches the cluster size
    (8 shards x 0.25 CPU consumed an entire 2-CPU cluster). They burst
    briefly per round; the scheduler handles that fine unreserved."""

    def __init__(
        self,
        shard_id: int,
        mode: str = "exact",
        bloom_bits: int = 1 << 24,
        robots_txt_by_host: dict | None = None,
        obey_robots: bool = False,
    ):
        self.reset(shard_id, mode, bloom_bits, robots_txt_by_host, obey_robots)

    def reset(
        self,
        shard_id: int,
        mode: str = "exact",
        bloom_bits: int = 1 << 24,
        robots_txt_by_host: dict | None = None,
        obey_robots: bool = False,
    ) -> None:
        """Full re-initialization — lets a crawl REUSE a pooled shard
        actor from a previous crawl (actor spawn + Ray's one-time
        Arrow-serializer warmup cost ~0.5 s per fresh process, paid in
        round 0 otherwise). Every field is rebuilt; nothing survives."""
        assert mode in ("exact", "approx")
        from .politeness import RobotsCache

        self.shard_id = shard_id
        self.mode = mode
        # robots cache colocated with the host's queue (T5); default-off
        # to match the reference's ROBOTSTXT_OBEY = False (settings.py:19)
        self.robots = RobotsCache(robots_txt_by_host, obey_robots=obey_robots)
        self.seen: set[str] = set()
        self.errored: dict[str, str] = {}
        self.in_flight: set[str] = set()
        # pending: url -> (depth, host); first enqueue wins (depth is the
        # BFS discovery depth — a url is only ever enqueued once)
        self.pending: dict[str, tuple[int, str]] = {}
        self.bloom = _Bloom(bloom_bits) if mode == "approx" else None
        # politeness: per-host budget carry (AutoThrottle stand-in, T5)
        self.host_backlog: dict[str, int] = {}
        # delivery counters for fire-and-forget task->shard RPCs: the
        # driver reconciles these against per-task sent counts instead
        # of shipping control rows through itself
        self.recv_fetched = 0
        self.recv_candidates = 0

    def warm(self) -> pa.Table:
        """Return an empty Arrow table: forces Ray's one-time
        Arrow-serialization setup in this worker process during actor
        creation instead of inside the first crawl round."""
        return pa.table({"url": pa.array([], pa.string())})

    # -- ingest ------------------------------------------------------
    def enqueue(self, urls: list[str], depths: list[int], hosts: list[str]) -> int:
        """Admit candidate URLs to pending; returns number admitted.
        Drop rule = reference's quadruple-set check
        (goldie_playwright_parallel.py:606-617, 656-663). (A C-level
        set-difference variant was measured SLOWER than this loop — the
        batch dict build dominates; the loop stays.)"""
        added = 0
        for url, depth, host in zip(urls, depths, hosts):
            if self.robots.obey and not self.robots.allowed(url):
                # quarantined like a fetch failure: never enqueued,
                # never retried, visible in the errored table
                if url not in self.errored:
                    self.errored[url] = "robots_disallowed"
                continue
            if self.bloom is not None and not self.bloom.maybe_contains(
                _h64(url)
            ):
                pass  # definitely never seen — skip the set lookups
            elif (
                url in self.seen
                or url in self.errored
                or url in self.in_flight
                or url in self.pending
            ):
                continue
            self.pending[url] = (depth, host)
            if self.bloom is not None:
                self.bloom.add(_h64(url))
            added += 1
        return added

    # -- scheduling --------------------------------------------------
    def take(
        self,
        max_depth: int | None = None,
        per_host_budget: int | None = None,
        limit: int | None = None,
    ) -> pa.Table:
        """Select the next fetch batch: pending sorted by (depth, url)
        — the BFS priority order (O1, goldie_playwright_parallel.py:
        647-664, made deterministic per SURVEY §2.10) — capped per host
        (politeness) and optionally overall. Selected URLs move to
        in_flight; the rest stay pending for a later round."""
        items = sorted(
            (
                (depth, url, host)
                for url, (depth, host) in self.pending.items()
                if max_depth is None or depth <= max_depth
            ),
        )
        sel_urls: list[str] = []
        sel_depths: list[int] = []
        sel_hosts: list[str] = []
        host_counts: dict[str, int] = {}
        for depth, url, host in items:
            if limit is not None and len(sel_urls) >= limit:
                break
            if per_host_budget is not None:
                c = host_counts.get(host, 0)
                if c >= per_host_budget:
                    continue
                host_counts[host] = c + 1
            sel_urls.append(url)
            sel_depths.append(depth)
            sel_hosts.append(host)
        for url in sel_urls:
            del self.pending[url]
            self.in_flight.add(url)
        return pa.table(
            {
                "url": pa.array(sel_urls, pa.string()),
                "depth": pa.array(sel_depths, pa.int32()),
                "host": pa.array(sel_hosts, pa.string()),
            }
        )

    def enqueue_arrow(self, urls, depths, hosts) -> int:
        """Arrow-array variant of enqueue (zero-copy through plasma;
        the per-URL set work happens here, in parallel across shards)."""
        self.recv_candidates += len(urls)
        return self.enqueue(urls.to_pylist(), depths.to_pylist(), hosts.to_pylist())

    def record_fetched_arrow(self, urls) -> None:
        self.recv_fetched += len(urls)
        self.record_fetched(urls.to_pylist())

    def received(self) -> tuple[int, int]:
        return (self.recv_fetched, self.recv_candidates)

    def admitted_total(self) -> int:
        """pending+seen+errored+in_flight ever admitted (for stats)."""
        return len(self.pending) + len(self.seen) + len(self.errored) + len(self.in_flight)

    def requeue(self, urls: list[str], depths: list[int], hosts: list[str]) -> int:
        """Return un-taken URLs from in_flight to pending (the driver's
        global round_limit slice hands back the overflow so a capped
        round never exceeds — or silently drops — frontier URLs)."""
        n = 0
        for url, depth, host in zip(urls, depths, hosts):
            if url in self.in_flight:
                self.in_flight.discard(url)
                self.pending[url] = (depth, host)
                n += 1
        return n

    def record_fetched(self, urls: list[str]) -> None:
        """in_flight -> seen for successfully fetched URLs. Called from
        parallel map tasks as results stream in (idempotent). C-level
        set ops, no per-URL loop."""
        s = set(urls)
        self.in_flight -= s
        self.seen |= s

    def finish_round(self) -> list[str]:
        """End-of-round: any URL still in flight failed to fetch —
        quarantine to errored, never retried in-run
        (goldie_playwright_parallel.py:831-845, 610-613). Returns the
        newly errored URLs."""
        errored = sorted(self.in_flight)
        for url in errored:
            self.errored[url] = "not_found"
        self.in_flight.clear()
        return errored

    # -- introspection / checkpoint ---------------------------------
    def counts(self) -> dict:
        return {
            "shard": self.shard_id,
            "seen": len(self.seen),
            "pending": len(self.pending),
            "errored": len(self.errored),
            "in_flight": len(self.in_flight),
        }

    def dump(self) -> dict:
        """Checkpoint payload (Arrow tables, zero-copy through plasma)."""
        return {
            "shard": self.shard_id,
            "seen": pa.table({"url": pa.array(sorted(self.seen), pa.string())}),
            "pending": pa.table(
                {
                    "url": pa.array(list(self.pending.keys()), pa.string()),
                    "depth": pa.array(
                        [d for d, _ in self.pending.values()], pa.int32()
                    ),
                    "host": pa.array(
                        [h for _, h in self.pending.values()], pa.string()
                    ),
                }
            ),
            "errored": pa.table(
                {
                    "url": pa.array(list(self.errored.keys()), pa.string()),
                    "error": pa.array(list(self.errored.values()), pa.string()),
                }
            ),
        }

    def load(self, seen: pa.Table, pending: pa.Table, errored: pa.Table) -> None:
        self.seen = set(seen["url"].to_pylist())
        self.pending = {
            u: (d, h)
            for u, d, h in zip(
                pending["url"].to_pylist(),
                pending["depth"].to_pylist(),
                pending["host"].to_pylist(),
            )
        }
        self.errored = dict(
            zip(errored["url"].to_pylist(), errored["error"].to_pylist())
        )
        self.in_flight = set()
        if self.bloom is not None:
            for u in self.seen:
                self.bloom.add(_h64(u))
            for u in self.pending:
                self.bloom.add(_h64(u))
            for u in self.errored:
                self.bloom.add(_h64(u))


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
