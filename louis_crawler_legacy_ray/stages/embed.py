"""Embedder stage: chunk_items -> embedding_items (kurt, reference §3.3).

The reference's embedding model is a stub returning ``[0.0] * 1536``
with model name 'text-embedding-ada-002' (louis/models/openai.py:3-13,
kurt.py:12-21) — reproduced exactly in ``mode='stub'`` for parity tests.
``mode='fake'`` produces a deterministic token-hash embedding instead
(unit-normalized), useful for exercising similarity operators on
non-degenerate vectors; the real model would slot in the same actor.

Actor-pool stage (SURVEY §2.3 T6): model/client state built once per
actor; batched inference per __call__. The reference throttles to one
concurrent request (kurt.py:36-38) because of the remote API quota —
a local model has no such bound; concurrency is a stage knob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMBEDDING_DIM = 1536
EMBEDDING_MODEL = "text-embedding-ada-002"


def embedding_items_schema(dim: int = EMBEDDING_DIM) -> pa.Schema:
    return pa.schema(
        [
            ("token_id", pa.string()),
            ("embedding", pa.list_(pa.float32(), dim)),
            ("embedding_model", pa.string()),
        ]
    )


class EmbedderActor:
    def __init__(self, mode: str = "stub", dim: int = EMBEDDING_DIM):
        assert mode in ("stub", "fake")
        self.mode = mode
        self.dim = dim

    def _fake_embed(self, tokens_batch: list[list[int]]) -> np.ndarray:
        """Deterministic pseudo-embedding: bag-of-token-hash projected
        into dim buckets, unit-normalized. Pure function of the token
        ids — stable across runs/processes."""
        out = np.zeros((len(tokens_batch), self.dim), dtype=np.float32)
        for i, toks in enumerate(tokens_batch):
            if toks:
                idx = np.asarray(toks, dtype=np.int64) % self.dim
                np.add.at(out[i], idx, 1.0)
                n = np.linalg.norm(out[i])
                if n > 0:
                    out[i] /= n
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        token_ids = batch["chunk_id"] if "chunk_id" in batch.column_names else batch["token_id"]
        if self.mode == "stub":
            flat = np.zeros(n * self.dim, dtype=np.float32)
        else:
            tokens = batch["tokens"].to_pylist()
            flat = self._fake_embed(tokens).reshape(-1)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), self.dim)
        return pa.table(
            {
                "token_id": token_ids.cast(pa.string()),
                "embedding": emb,
                "embedding_model": pa.array([EMBEDDING_MODEL] * n, pa.string()),
            }
        )
