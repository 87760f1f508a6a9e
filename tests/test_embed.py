"""Kurt stage tests: anti-join work queue + stub/fake embedder parity
with the reference (models/openai.py:3-13 zeros, model name kurt.py:19)."""

import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.pipelines.embed import embed_chunks, unembedded_chunks
from louis_crawler_legacy_ray.stages.embed import EMBEDDING_MODEL, EmbedderActor


def _chunks_table():
    return pa.table(
        {
            "chunk_id": pa.array([f"c{i}" for i in range(10)]),
            "tokens": pa.array([[i, i + 1, i + 2] for i in range(10)], pa.list_(pa.int32())),
            "created_at": pa.array(list(range(10)), pa.timestamp("us")),
        }
    )


def test_embedder_stub_matches_reference():
    actor = EmbedderActor(mode="stub", dim=1536)
    out = actor(_chunks_table())
    assert out.num_rows == 10
    emb = out["embedding"][0].as_py()
    assert emb == [0.0] * 1536  # models/openai.py:13
    assert out["embedding_model"][0].as_py() == EMBEDDING_MODEL
    assert out["token_id"][0].as_py() == "c0"


def test_embedder_fake_deterministic_unit_norm():
    a = EmbedderActor(mode="fake", dim=64)(_chunks_table())
    b = EmbedderActor(mode="fake", dim=64)(_chunks_table())
    assert a["embedding"].to_pylist() == b["embedding"].to_pylist()
    import numpy as np

    v = np.array(a["embedding"][0].as_py())
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_anti_join_work_queue(ray_session):
    chunks = ray.data.from_arrow(_chunks_table())
    done = ray.data.from_arrow(
        pa.table({"token_id": pa.array([f"c{i}" for i in range(0, 10, 2)])})
    )
    todo = unembedded_chunks(chunks, done)
    ids = [r["chunk_id"] for r in todo.take_all()]
    assert ids == [f"c{i}" for i in range(1, 10, 2)]  # odd ids, created_at order


def test_embed_pipeline_e2e(ray_session):
    chunks = ray.data.from_arrow(_chunks_table())
    out = embed_chunks(unembedded_chunks(chunks, None), mode="stub", concurrency=1)
    t = out.take_all()
    assert len(t) == 10
    assert all(len(r["embedding"]) == 1536 for r in t)
