"""Ingest pipeline: pages parquet -> extract -> crawl_items (+ edges).

The Ray-Data-native replacement for the goldie spider's fetch->clean->
store loop (reference §3.1): a streaming Dataset pipeline, no frontier
(the frontier engine in pipelines/crawl.py drives this stage per round;
this module also works standalone over a full pages corpus — the "hawn
replay" mode where the stored table IS the source, SURVEY §2.1 S3).
"""

from __future__ import annotations

import ray.data

from ..stages.extract import edges_batch, extract_batch


def read_pages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Pages corpus reader with column pruning at the read."""
    return ray.data.read_parquet(path, columns=columns or ["url", "html"])


def extract_pages(
    pages: ray.data.Dataset,
    now_us: int = 0,
    allowed_domains: list[str] | None = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """pages -> crawl_items. Stateless tasks (no model state to amortize)."""
    import functools

    fn = functools.partial(
        extract_batch, now_us=now_us, allowed_domains=allowed_domains
    )
    return pages.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def extract_edges(crawl_items: ray.data.Dataset) -> ray.data.Dataset:
    """crawl_items -> deduplicated link-graph edges (src, dst, depth).

    Edge dedup = first-wins on (src, dst) (db.py:479-481 UNIQUE +
    ON CONFLICT DO NOTHING): groupby keeps min depth for determinism.
    """
    edges = crawl_items.map_batches(edges_batch, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return edges.groupby(["src", "dst"]).aggregate(Min("depth", alias_name="depth"))


def ingest(
    pages_path: str,
    out_dir: str,
    now_us: int = 0,
    write_edges: bool = True,
) -> dict:
    """Full standalone ingest: read -> extract -> write parquet sinks."""
    pages = read_pages(pages_path)
    items = extract_pages(pages, now_us=now_us)
    items.write_parquet(f"{out_dir}/crawl_items")
    result = {"crawl_items": f"{out_dir}/crawl_items"}
    if write_edges:
        # derive edges from the just-written columnar output (column-pruned
        # re-read of url/depth/links) instead of re-running the HTML parse
        stored = ray.data.read_parquet(
            f"{out_dir}/crawl_items", columns=["url", "depth", "links"]
        )
        extract_edges(stored).write_parquet(f"{out_dir}/links")
        result["links"] = f"{out_dir}/links"
    return result
