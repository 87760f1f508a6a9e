"""The URL-frontier + fetch scheduler — the from-scratch core
(north_rule): depth-synchronous BFS rounds over sharded frontier-state
actors, with a pluggable per-round expansion stage.

Round r (SURVEY §3.4):

    take:    every shard returns its admissible pending batch, sorted
             (depth, url), per-host politeness budget applied
    expand:  the "fetch" — for the pages corpus this is a broadcast
             semi-join of the pages table against the selected URL set
             followed by the extract kernel (zero-copy Arrow
             map_batches); the in-sandbox stand-in for network fetch,
             exactly how the reference's goldie serves pages from a
             local cache (middlewares.py:102-117)
    settle:  fetched -> seen; missing from the corpus -> errored (the
             reference's 404/quarantine path, responses.py:30-35,
             goldie_playwright_parallel.py:831-845)
    enqueue: extracted edges become depth+1 candidates; shards drop
             anything in seen/pending/errored/in-flight
    checkpoint: per-shard parquet dump + lineage manifest + metrics

The reference's production loop is the same shape with a single-process
seen set and a ProcessPoolExecutor batch barrier
(goldie_playwright_parallel.py:761-865); here each phase is a streaming
Ray Data pipeline and only the *frontier control* (small tables of
URLs) synchronizes per round.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.extract import extract_batch
from ..state.checkpoint import (
    append_metrics,
    latest_complete_round,
    load_checkpoint,
    write_checkpoint,
)
from ..state.seen import FrontierShard, host_of, shard_for_host


@dataclass
class CrawlConfig:
    n_shards: int = 4
    max_depth: int = 4                      # run.sh:5 production knob
    per_host_budget: int | None = None      # politeness cap per round; None = unbounded
    round_limit: int | None = None          # overall per-round URL cap
    max_rounds: int = 64
    allowed_domains: list[str] | None = None
    mode: str = "exact"                     # seen-filter mode: exact | approx
    checkpoint_dir: str | None = None
    extract_batch_size: int = 256
    hot_host_salt: dict = field(default_factory=dict)  # host -> n_salts


def config_hash(cfg: CrawlConfig, seeds: list[str]) -> str:
    payload = json.dumps(
        {
            "n_shards": cfg.n_shards,
            "max_depth": cfg.max_depth,
            "per_host_budget": cfg.per_host_budget,
            "seeds": sorted(seeds),
            "mode": cfg.mode,
        },
        sort_keys=True,
    )
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


class Frontier:
    """Driver-side handle over the shard actors."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.shards = [
            FrontierShard.remote(i, mode=cfg.mode) for i in range(cfg.n_shards)
        ]

    def _shard_of(self, host: str, url: str) -> int:
        n_salt = self.cfg.hot_host_salt.get(host)
        if n_salt:
            # hot-host salting: spread one host's URLs over n_salt shards
            # (politeness budget is per (host, salt) sub-queue; the
            # effective host budget multiplies — document when used)
            salt = shard_for_host(url, n_salt)
            return shard_for_host(f"{host}#{salt}", self.cfg.n_shards)
        return shard_for_host(host, self.cfg.n_shards)

    def enqueue_table(self, urls: list[str], depths: list[int]) -> int:
        """Route candidates to their owning shards; returns admitted."""
        by_shard: dict[int, tuple[list, list, list]] = {}
        for url, depth in zip(urls, depths):
            host = host_of(url)
            sid = self._shard_of(host, url)
            b = by_shard.setdefault(sid, ([], [], []))
            b[0].append(url)
            b[1].append(depth)
            b[2].append(host)
        refs = [
            self.shards[sid].enqueue.remote(u, d, h)
            for sid, (u, d, h) in by_shard.items()
        ]
        return sum(ray.get(refs))

    def take_round(self) -> pa.Table:
        cfg = self.cfg
        per_shard_limit = None
        if cfg.round_limit is not None:
            per_shard_limit = max(1, cfg.round_limit // cfg.n_shards)
        tables = ray.get(
            [
                s.take.remote(
                    max_depth=cfg.max_depth,
                    per_host_budget=cfg.per_host_budget,
                    limit=per_shard_limit,
                )
                for s in self.shards
            ]
        )
        return pa.concat_tables(tables)

    def settle(self, selected: pa.Table, fetched_urls: set[str]) -> int:
        """fetched -> seen, missing -> errored; returns error count."""
        n_err = 0
        by_shard: dict[int, tuple[list, list, list]] = {}
        for url, host in zip(
            selected["url"].to_pylist(), selected["host"].to_pylist()
        ):
            sid = self._shard_of(host, url)
            b = by_shard.setdefault(sid, ([], [], []))
            if url in fetched_urls:
                b[0].append(url)
            else:
                b[1].append(url)
                b[2].append("not_found")
                n_err += 1
        ray.get(
            [
                self.shards[sid].settle.remote(ok, bad, errs)
                for sid, (ok, bad, errs) in by_shard.items()
            ]
        )
        return n_err

    def counts(self) -> dict:
        per = ray.get([s.counts.remote() for s in self.shards])
        tot = {
            k: sum(p[k] for p in per) for k in ("seen", "pending", "errored", "in_flight")
        }
        tot["per_shard"] = per
        return tot


def pages_expand(pages_path: str, cfg: CrawlConfig, out_dir: str | None, now_us: int):
    """Expansion stage over a Common-Crawl-style pages corpus: broadcast
    semi-join on the selected URL set + extract kernel. Returns
    (fetched_urls, edges_table) and streams crawl_items to parquet."""
    import functools

    def expand(selected: pa.Table, round_no: int):
        url_set = selected["url"].combine_chunks() if isinstance(selected["url"], pa.ChunkedArray) else selected["url"]
        depth_by_url = dict(
            zip(selected["url"].to_pylist(), selected["depth"].to_pylist())
        )

        def fetch_filter(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["url"], value_set=url_set)
            hit = batch.filter(mask)
            if hit.num_rows == 0:
                return hit.append_column("depth", pa.array([], pa.int32()))
            depths = pa.array(
                [depth_by_url[u] for u in hit["url"].to_pylist()], pa.int32()
            )
            return hit.append_column("depth", depths)

        ds = ray.data.read_parquet(pages_path, columns=["url", "html"])
        ds = ds.map_batches(fetch_filter, batch_format="pyarrow")
        ds = ds.map_batches(
            functools.partial(
                extract_batch, now_us=now_us, allowed_domains=cfg.allowed_domains
            ),
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
        # consume the stream: write round output and collect the tiny
        # control columns (url + links) on the driver
        fetched: list[str] = []
        edges_src: list[str] = []
        edges_dst: list[str] = []
        edges_depth: list[int] = []
        if out_dir is not None:
            # write crawl items for this round, then re-read control cols
            ds.write_parquet(f"{out_dir}/crawl_items/round={round_no:06d}")
            ctrl = ray.data.read_parquet(
                f"{out_dir}/crawl_items/round={round_no:06d}",
                columns=["url", "depth", "links"],
            )
        else:
            ctrl = ds.select_columns(["url", "depth", "links"])
        for batch in ctrl.iter_batches(batch_format="pyarrow"):
            urls = batch["url"].to_pylist()
            depths = batch["depth"].to_pylist()
            links = batch["links"].to_pylist()
            fetched.extend(urls)
            for u, d, ls in zip(urls, depths, links):
                for dst in ls:
                    edges_src.append(u)
                    edges_dst.append(dst)
                    edges_depth.append(d + 1)
        edges = pa.table(
            {
                "src": pa.array(edges_src, pa.string()),
                "dst": pa.array(edges_dst, pa.string()),
                "depth": pa.array(edges_depth, pa.int32()),
            }
        )
        return fetched, edges

    return expand


def edges_expand(edges_table: pa.Table):
    """Expansion over a plain (src, dst) edge table — the frontier
    engine exercised as a pure BFS (used by the oracle-checked
    crawl_bfs query; every URL exists, none error)."""

    def expand(selected: pa.Table, round_no: int):
        sel_urls = selected["url"]
        depth_by_url = dict(
            zip(selected["url"].to_pylist(), selected["depth"].to_pylist())
        )
        mask = pc.is_in(edges_table["src"], value_set=sel_urls.combine_chunks() if isinstance(sel_urls, pa.ChunkedArray) else sel_urls)
        hit = edges_table.filter(mask)
        srcs = hit["src"].to_pylist()
        dsts = hit["dst"].to_pylist()
        edges = pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
                "depth": pa.array(
                    [depth_by_url[s] + 1 for s in srcs], pa.int32()
                ),
            }
        )
        return selected["url"].to_pylist(), edges

    return expand


@dataclass
class CrawlResult:
    rounds: int
    order: pa.Table          # (round, depth, url) in deterministic fetch order
    counts: dict
    out_dir: str | None
    metrics: list[dict]


def run_frontier(
    expand,
    seeds: list[str],
    cfg: CrawlConfig,
    resume: bool = False,
) -> CrawlResult:
    """Depth-synchronous frontier loop. ``expand(selected, round_no) ->
    (fetched_urls, edges_table)``."""
    frontier = Frontier(cfg)
    chash = config_hash(cfg, seeds)
    start_round = 0
    if resume and cfg.checkpoint_dir:
        last = latest_complete_round(cfg.checkpoint_dir)
        if last is not None:
            load_checkpoint(cfg.checkpoint_dir, last, frontier.shards)
            start_round = last + 1
    if start_round == 0:
        frontier.enqueue_table(seeds, [0] * len(seeds))

    order_rows: list[tuple[int, int, str]] = []
    metrics: list[dict] = []
    round_no = start_round
    while round_no < cfg.max_rounds:
        t0 = time.perf_counter()
        selected = frontier.take_round()
        if selected.num_rows == 0:
            break
        # deterministic global order within the round
        selected = selected.sort_by([("depth", "ascending"), ("url", "ascending")])
        fetched_urls, edges = expand(selected, round_no)
        n_err = frontier.settle(selected, set(fetched_urls))
        n_new = 0
        if edges.num_rows > 0:
            keep = pc.less_equal(edges["depth"], pa.scalar(cfg.max_depth, pa.int32()))
            edges = edges.filter(keep)
            if edges.num_rows > 0:
                n_new = frontier.enqueue_table(
                    edges["dst"].to_pylist(), edges["depth"].to_pylist()
                )
        fetched_set = set(fetched_urls)
        for d, u in zip(selected["depth"].to_pylist(), selected["url"].to_pylist()):
            if u in fetched_set:  # crawl order lists successful fetches only
                order_rows.append((round_no, d, u))
        dt = time.perf_counter() - t0
        counts = frontier.counts()
        row = {
            "round": round_no,
            "selected": selected.num_rows,
            "fetched": len(fetched_urls),
            "errored": n_err,
            "new_candidates": n_new,
            "pending_lag": counts["pending"],
            "seconds": dt,
            "urls_per_sec": selected.num_rows / dt if dt > 0 else 0.0,
        }
        metrics.append(row)
        if cfg.checkpoint_dir:
            write_checkpoint(cfg.checkpoint_dir, round_no, frontier.shards, chash, row)
            append_metrics(cfg.checkpoint_dir, [row])
        round_no += 1

    order = pa.table(
        {
            "round": pa.array([r for r, _, _ in order_rows], pa.int32()),
            "depth": pa.array([d for _, d, _ in order_rows], pa.int32()),
            "url": pa.array([u for _, _, u in order_rows], pa.string()),
        }
    )
    return CrawlResult(
        rounds=round_no,
        order=order,
        counts=frontier.counts(),
        out_dir=None,
        metrics=metrics,
    )


def run_crawl(
    pages_path: str,
    seeds: list[str],
    cfg: CrawlConfig,
    out_dir: str | None = None,
    now_us: int = 0,
    resume: bool = False,
) -> CrawlResult:
    """The full goldie-equivalent crawl over a pages corpus."""
    expand = pages_expand(pages_path, cfg, out_dir, now_us)
    res = run_frontier(expand, seeds, cfg, resume=resume)
    res.out_dir = out_dir
    return res
