"""Forced-distributed-arm oracle parity (round 5).

Every stats-driven planner guard (CC_LOCAL_EDGES, GRAPH_LOCAL_EDGES,
BROADCAST_SCORE_ROWS, HARMONIC_BROADCAST_EDGES, LEXICAL_BROADCAST_ROWS,
CONTAINMENT_BROADCAST_DOCS) is env-overridable; setting them to -1
forces the 100 TB code paths — partitioned hash joins, the pointer-
jumping distributed CC loop, shuffle BFS, block×block matmul — at gate
scale, where the DuckDB oracle can then certify them. The full 17-query
sweep ran green end-of-round (BASELINE.md); this test pins two
representative queries (distributed CC + the partitioned dual-rank
fixpoint) as a subprocess so the env overrides bind at import time.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FORCE = {
    "LOUIS_CC_LOCAL_EDGES": "-1",
    "LOUIS_GRAPH_LOCAL_EDGES": "-1",
    "LOUIS_BROADCAST_SCORE_ROWS": "-1",
    "LOUIS_HARMONIC_BROADCAST_EDGES": "-1",
    "LOUIS_LEXICAL_BROADCAST_ROWS": "-1",
    "LOUIS_CONTAINMENT_BROADCAST_DOCS": "-1",
}


def test_forced_distributed_arms_hash_match_oracle():
    env = dict(os.environ, **FORCE, RAY_ADDRESS="local")
    r = subprocess.run(
        [
            sys.executable,
            "tools/selfcheck.py",
            "--sf",
            "/root/testdata/sf0.001",
            "dedup_clusters",
            "spam_mass",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ok_lines = [
        ln for ln in r.stdout.splitlines() if ln.startswith("OK")
    ]
    assert len(ok_lines) == 2 and all(
        "hash match" in ln for ln in ok_lines
    ), r.stdout[-1500:]
