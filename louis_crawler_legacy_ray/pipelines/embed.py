"""Kurt pipeline: chunks ∖ embeddings -> embedder -> embedding_items.

Reference §3.3: kurt enumerates chunk ids without embeddings via a SQL
anti-join ordered by created_at (db.py:686-703), then calls the
embedding model one chunk at a time. Here: broadcast anti-join (the
embedded-id set is the small side) -> sort(created_at) -> actor-pool
embedder (batched, concurrency is a knob instead of the reference's
hard CONCURRENT_REQUESTS=1 quota workaround, kurt.py:36-38).
"""

from __future__ import annotations

import ray.data

from ..stages import pool_size

from ..stages.embed import EmbedderActor
from ..stages.joins import broadcast_anti_join


def unembedded_chunks(
    chunks: ray.data.Dataset, embeddings: ray.data.Dataset | None
) -> ray.data.Dataset:
    """The work-remaining queue (J1): chunks whose chunk_id has no
    embedding row, ordered by created_at (db.py:700-702)."""
    if embeddings is not None:
        chunks = broadcast_anti_join(chunks, embeddings, "chunk_id", "token_id")
    return chunks.sort("created_at")


def embed_chunks(
    chunks: ray.data.Dataset,
    mode: str = "stub",
    dim: int = 1536,
    batch_size: int = 256,
    concurrency=None,
) -> ray.data.Dataset:
    if concurrency is None:
        concurrency = pool_size()
    return chunks.map_batches(
        EmbedderActor,
        fn_constructor_kwargs={"mode": mode, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def kurt(
    chunks_path: str,
    embeddings_path: str | None,
    out_dir: str,
    mode: str = "stub",
) -> str:
    """Standalone kurt run over stored parquet tables."""
    chunks = ray.data.read_parquet(
        chunks_path, columns=["chunk_id", "tokens", "created_at"]
    )
    embeddings = (
        ray.data.read_parquet(embeddings_path, columns=["token_id"])
        if embeddings_path
        else None
    )
    todo = unembedded_chunks(chunks, embeddings)
    out = embed_chunks(todo, mode=mode)
    out.write_parquet(f"{out_dir}/embeddings")
    return f"{out_dir}/embeddings"
