"""Checkpoint atomicity: a round directory without _lineage.json (a
crash mid-dump) is invisible to resume; lineage carries config hash."""

import json
import os
import shutil

from louis_crawler_legacy_ray.state.checkpoint import (
    latest_complete_round,
    read_lineage,
)


def test_incomplete_round_ignored(ray_session, tmp_path):
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    edges = pa.table(
        {
            "src": ["n0", "n0", "n1", "n2"],
            "dst": ["n1", "n2", "n3", "n4"],
        }
    )
    ck = str(tmp_path / "ckpt")
    cfg = CrawlConfig(n_shards=2, max_depth=5, max_rounds=10, checkpoint_dir=ck)
    res = run_frontier(edges_expand(edges), ["n0"], cfg)
    assert res.rounds >= 3
    last = latest_complete_round(ck)
    assert last == res.rounds - 1

    # simulate a crash mid-checkpoint: a newer round dir w/o lineage
    fake = os.path.join(ck, f"round={last + 1:06d}")
    os.makedirs(os.path.join(fake, "shard=0000"))
    assert latest_complete_round(ck) == last  # incomplete dir invisible

    # lineage content is auditable
    lin = read_lineage(ck, last)
    assert lin["round"] == last
    assert lin["n_shards"] == 2
    assert set(lin["counts"]) == {"seen", "pending", "errored"}
    assert "config_hash" in lin

    shutil.rmtree(fake)


def test_lineage_json_is_last_write(ray_session, tmp_path):
    """The commit marker lands only after all shard dumps exist."""
    import pyarrow as pa

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    edges = pa.table({"src": ["a"], "dst": ["b"]})
    ck = str(tmp_path / "ck2")
    run_frontier(
        edges_expand(edges),
        ["a"],
        CrawlConfig(n_shards=2, max_depth=2, max_rounds=5, checkpoint_dir=ck),
    )
    for name in os.listdir(ck):
        if not name.startswith("round="):
            continue
        rdir = os.path.join(ck, name)
        with open(os.path.join(rdir, "_lineage.json")) as f:
            lin = json.load(f)
        for i in range(lin["n_shards"]):
            sdir = os.path.join(rdir, f"shard={i:04d}")
            for t in ("seen", "pending", "errored"):
                assert os.path.exists(os.path.join(sdir, f"{t}.parquet"))


def test_resume_refuses_mismatched_config(ray_session, tmp_path):
    """Resume under a different config or seed list raises instead of
    silently continuing the wrong crawl (lineage config_hash check)."""
    import pyarrow as pa
    import pytest

    from louis_crawler_legacy_ray.pipelines.crawl import (
        CrawlConfig,
        edges_expand,
        run_frontier,
    )

    edges = pa.table({"src": ["a", "b"], "dst": ["b", "c"]})
    ck = str(tmp_path / "ck3")
    cfg = CrawlConfig(n_shards=2, max_depth=3, max_rounds=6, checkpoint_dir=ck)
    run_frontier(edges_expand(edges), ["a"], cfg)

    other_depth = CrawlConfig(
        n_shards=2, max_depth=4, max_rounds=6, checkpoint_dir=ck
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        run_frontier(edges_expand(edges), ["a"], other_depth, resume=True)
    with pytest.raises(ValueError, match="refusing to resume"):
        run_frontier(edges_expand(edges), ["b"], cfg, resume=True)
    # matching config + seeds resumes fine (nothing left to do)
    res = run_frontier(edges_expand(edges), ["a"], cfg, resume=True)
    assert res.counts["pending"] == 0
