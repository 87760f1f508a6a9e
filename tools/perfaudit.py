"""Per-operator wall-time audit for the headline queries.

``ds.stats()``'s "Operator executed in Xs" includes upstream wait, so
eyeballing it misleads (see BASELINE.md round-2 notes); this tool
parses the per-operator REMOTE wall / UDF totals out of the stats
blob and prints a compact per-stage table — the "iterate until
wall-time is dominated by useful compute" feedback loop, runnable any
round:

    python tools/perfaudit.py [--sf /root/testdata/sf0.01] [names...]

Default names are the bench suite's heaviest queries. Output: one
line per (query, operator) with remote wall, UDF time, rows, and the
query's driver wall — a regression harness for operator shape, not a
benchmark (absolute numbers drift with the box; the SHAPE — which
stage dominates, whether UDF time ~= remote wall — is the signal).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OP_RE = re.compile(r"Operator (\d+) (\S+?):")
_WALL_RE = re.compile(r"\* Remote wall time: .*?, ([\d.]+)(ms|s|us) total")
_UDF_RE = re.compile(r"\* UDF time: .*?, ([\d.]+)(ms|s|us) total")
_ROWS_RE = re.compile(r"\* Output num rows per block: .*? (\d+) total")

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def _sections(stats: str):
    """Split a Dataset.stats() blob into (operator_name, body) chunks."""
    marks = [(m.start(), m.group(2)) for m in _OP_RE.finditer(stats)]
    for (start, name), nxt in zip(marks, marks[1:] + [(len(stats), None)]):
        yield name, stats[start : nxt[0]]


def audit(sf_dir: str, names: list[str]) -> None:
    from louis_crawler_legacy_ray.pipelines.queries import QUERIES

    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        out = fn(sf_dir)
        stats = None
        if hasattr(out, "materialize"):
            out = out.materialize()
            out.count()
            stats = out.stats()
        wall = time.perf_counter() - t0
        print(f"\n== {name}: driver wall {wall:.3f}s")
        if stats is None:
            print("   (returns an Arrow table — no Dataset stats)")
            continue
        for op_name, body in _sections(stats):
            w = _WALL_RE.search(body)
            u = _UDF_RE.search(body)
            r = _ROWS_RE.search(body)
            rw = float(w.group(1)) * _UNIT[w.group(2)] if w else 0.0
            ut = float(u.group(1)) * _UNIT[u.group(2)] if u else 0.0
            rows = int(r.group(1)) if r else 0
            print(
                f"   {op_name[:52]:52s} remote={rw:8.3f}s udf={ut:8.3f}s"
                f" rows={rows}"
            )


DEFAULT = [
    "shipping_priority",
    "duplicate_ngrams",
    "minhash_pairs",
    "line_dedup",
    "chunk_documents",
    "inverted_index",
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("names", nargs="*", default=DEFAULT)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    audit(args.sf, args.names or DEFAULT)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
