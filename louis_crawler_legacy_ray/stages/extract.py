"""Ray Data extract stage: pages -> crawl_items (+ link edges).

The goldie ``convert_to_crawl_item`` (reference goldie.py:10-45) as a
stateless ``map_batches`` transform over zero-copy Arrow batches. The
per-row HTML parse is inherently row-wise Python (DOM recursion), but it
runs batch-wise over Arrow columns and emits Arrow arrays — no pandas
conversion, no Python-object blocks.

Usage:
    ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=128)

Batch size is modest because rows are wide (html payloads, FIXTURES.md
953 B - 152 KB); block splitting handles the rest.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html_kernels import extract_page

CRAWL_ITEMS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("lang", pa.string()),
        ("html_content", pa.large_string()),
        ("last_crawled", pa.timestamp("us")),
        ("last_updated", pa.string()),
        ("depth", pa.int32()),
        ("children", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
        ("redirect", pa.string()),
        ("meta_robots", pa.string()),
        ("canonical", pa.string()),
    ]
)


def extract_batch(
    batch: pa.Table,
    now_us: int = 0,
    allowed_domains: list[str] | None = None,
) -> pa.Table:
    """pages(url, html[, depth]) -> crawl_items.

    ``now_us`` is the injected deterministic clock (reference uses
    int(time.time()), goldie.py:16 — injected here for reproducibility,
    SURVEY §2.2 M9). ``depth`` passes through when present (set by the
    frontier; items.py:18 note: only the parallel spider sets it).
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    depths = (
        batch["depth"].to_pylist()
        if "depth" in batch.column_names
        else [0] * len(urls)
    )
    items = extract_items(urls, htmls, depths, now_us, allowed_domains)
    if "cash" in batch.column_names:
        # OPIC passthrough (pipelines/crawl.py): extract is 1 row per
        # input page, so the parent-cash column stays aligned
        col = batch["cash"]
        items = items.append_column(
            "cash", col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
    return items


def extract_items(
    urls: list,
    htmls: list,
    depths: list,
    now_us: int = 0,
    allowed_domains: list[str] | None = None,
) -> pa.Table:
    """Core of extract_batch over plain Python lists — lets callers that
    already hold row-selected strings (the fused round task picks html
    values straight out of the pinned corpus block by index, one Arrow→
    str copy instead of a filter copy plus to_pylist) skip the table
    detour."""
    out: dict[str, list] = {
        "url": [],
        "title": [],
        "lang": [],
        "html_content": [],
        "last_crawled": [],
        "last_updated": [],
        "depth": [],
        "children": [],
        "links": [],
        "redirect": [],
        "meta_robots": [],
        "canonical": [],
    }
    for url, html, depth in zip(urls, htmls, depths):
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        rec = extract_page(url, html, now=now_us, allowed_domains=allowed_domains)
        out["url"].append(rec["url"])
        out["title"].append(rec["title"])
        out["lang"].append(rec["lang"])
        out["html_content"].append(rec["html_content"])
        out["last_crawled"].append(now_us)
        out["last_updated"].append(rec["last_updated"])
        out["depth"].append(depth)
        out["children"].append(rec["children"])
        out["links"].append(rec["links"])
        out["redirect"].append(rec.get("redirect"))
        out["meta_robots"].append(rec.get("meta_robots", ""))
        out["canonical"].append(rec.get("canonical"))
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "html_content": pa.array(out["html_content"], pa.large_string()),
            "last_crawled": pa.array(out["last_crawled"], pa.timestamp("us")),
            "last_updated": pa.array(out["last_updated"], pa.string()),
            "depth": pa.array(out["depth"], pa.int32()),
            "children": pa.array(out["children"], pa.list_(pa.string())),
            "links": pa.array(out["links"], pa.list_(pa.string())),
            "redirect": pa.array(out["redirect"], pa.string()),
            "meta_robots": pa.array(out["meta_robots"], pa.string()),
            "canonical": pa.array(out["canonical"], pa.string()),
        }
    )


def edges_batch(batch: pa.Table) -> pa.Table:
    """Explode crawl_items.links into link-graph edges (src, dst, depth)
    — the reference's page_links side output (middlewares.py:104-113,
    db.py:671-683). Vectorized via Arrow list flattening: no Python loop
    over rows; dst depth = src depth + 1."""
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    counts = pa.compute.list_value_length(links).fill_null(0)
    src = batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    depth = batch["depth"].combine_chunks() if isinstance(batch["depth"], pa.ChunkedArray) else batch["depth"]
    # repeat src/depth per link count (numpy repeat on indices)
    import numpy as np

    idx = np.repeat(np.arange(len(batch)), counts.to_numpy(zero_copy_only=False))
    dst = links.flatten()
    return pa.table(
        {
            "src": src.take(pa.array(idx, pa.int64())),
            "dst": dst,
            "depth": pa.compute.add(
                depth.take(pa.array(idx, pa.int64())).cast(pa.int32()), 1
            ),
        }
    )
