"""Chunker stage: crawl_items -> chunk_items (hawn, reference §3.3).

A stateful actor-pool ``map_batches`` stage: the tokenizer (with its
memo cache) is built once per actor in ``__init__`` — mirroring the
reference's module-global tiktoken encoder (chunking.py:10, SURVEY §2.3
T1) — and each ``__call__`` explodes one batch of pages into k chunk
rows (flat-map shape: one page -> many chunks).

Usage:
    items.map_batches(ChunkerActor, batch_format="pyarrow",
                      batch_size=64, concurrency=(2, 8))

Chunk ids are deterministic (blake2b of url + chunk index) unlike the
reference's uuid4 per row (db.py:142) — required for reproducible
anti-joins downstream (SURVEY §1.3).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.chunking import chunk_html
from ..functions.tokenizer import Encoder

CHUNK_ITEMS_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("text_content", pa.large_string()),
        ("token_count", pa.int32()),
        ("tokens", pa.list_(pa.int32())),
        ("created_at", pa.timestamp("us")),
    ]
)


def chunk_id_for(url: str, index: int) -> str:
    return hashlib.blake2b(f"{url}#{index}".encode(), digest_size=16).hexdigest()


class ChunkerActor:
    def __init__(self):
        self.enc = Encoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _chunk_table(batch, self.enc)


# process-global encoder for the TASK-pool variant below: Ray reuses
# worker processes, so the memo cache persists across batches exactly
# like the actor's — without paying actor-pool spin-up (~0.5 s x pool
# size, measured to dominate the chunker stage's wall at bench scale,
# since Encoder() itself builds in ~3 us)
_PROCESS_ENC: Encoder | None = None


def chunk_batch(batch: pa.Table) -> pa.Table:
    """Task-pool chunker: same kernel and cache behavior as
    ChunkerActor (which stays as the documented stateful-stage shape,
    SURVEY §2.3 T1 — the pattern a heavyweight tokenizer needs), but
    scheduled as plain tasks because THIS encoder is trivial to build."""
    global _PROCESS_ENC
    if _PROCESS_ENC is None:
        _PROCESS_ENC = Encoder()
    return _chunk_table(batch, _PROCESS_ENC)


def _chunk_table(batch: pa.Table, enc: Encoder) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html_content"].to_pylist()
        created = (
            batch["last_crawled"].to_pylist()
            if "last_crawled" in batch.column_names
            else [0] * len(urls)
        )
        out = {k: [] for k in ("chunk_id", "url", "title", "text_content", "token_count", "tokens", "created_at")}
        for url, html, ts in zip(urls, htmls, created):
            if html is None:
                continue
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            for i, chunk in enumerate(chunk_html(html, enc)):
                out["chunk_id"].append(chunk_id_for(url, i))
                out["url"].append(url)
                out["title"].append(chunk["title"])
                out["text_content"].append(chunk["text_content"])
                out["token_count"].append(chunk["token_count"])
                out["tokens"].append(chunk["tokens"])
                out["created_at"].append(ts)
        return pa.table(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "title": pa.array(out["title"], pa.string()),
                "text_content": pa.array(out["text_content"], pa.large_string()),
                "token_count": pa.array(out["token_count"], pa.int32()),
                "tokens": pa.array(out["tokens"], pa.list_(pa.int32())),
                "created_at": pa.array(out["created_at"], pa.timestamp("us")),
            }
        )
