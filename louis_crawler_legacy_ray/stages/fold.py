"""K-ary tree reduction of per-block sketch blobs (VERDICT r3 'Next
round' #4).

The mergeable-sketch operators (bloom bitmap, HLL, QuantileSketch)
produce one small binary blob per input block. Folding those blobs by
iterating rows on the driver is correct but O(blocks) through one
process — at 100 TB with ~1M blocks that is a million sequential
object-store reads on the critical path. This helper folds them as a
fan-in tree of plain Ray tasks instead:

* leaves are the partials dataset's OWN block refs
  (``Dataset.to_arrow_refs()`` — no driver materialization; the blobs
  never leave the object store until the root);
* each task merges up to ``fanout`` children and emits one blob;
* depth is O(log_fanout blocks); the driver holds only refs and the
  single root blob.

The merge callables are module-level (picklable) and associative +
commutative (bitmap OR, register max, compactor merge), so the tree
order is free.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import ray


@ray.remote
def _fold_task(merge_fn: Callable, col: str, *children) -> bytes:
    """Merge one tier's children: leaf children arrive as pyarrow
    Tables (the partials dataset's blocks, possibly multi-row), inner
    children as already-merged bytes."""
    blobs: list[bytes] = []
    for ch in children:
        if isinstance(ch, pa.Table):
            if col in ch.column_names:
                blobs.extend(v for v in ch[col].to_pylist() if v is not None)
        else:
            blobs.append(ch)
    return merge_fn(blobs)


def tree_fold_blobs(
    partials: "ray.data.Dataset",
    col: str,
    merge_fn: Callable[[list[bytes]], bytes],
    fanout: int = 16,
) -> bytes:
    """Fold a Dataset of per-block blobs (column ``col``) down to ONE
    blob with a fan-in-``fanout`` task tree. ``merge_fn(list[bytes])
    -> bytes`` must accept the empty list (identity element) and be
    order-insensitive."""
    level: list = partials.to_arrow_refs()
    if not level:
        return merge_fn([])
    first = True
    while first or len(level) > 1:
        level = [
            _fold_task.remote(merge_fn, col, *level[i : i + fanout])
            for i in range(0, len(level), fanout)
        ]
        first = False
    return ray.get(level[0])
