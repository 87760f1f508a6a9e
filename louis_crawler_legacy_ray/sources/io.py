"""Sinks/loaders beyond parquet (SURVEY §2.1).

* Feed exports (S12, `scrapy crawl ... -o items.json` equivalent):
  :func:`export_feed` writes a Dataset as a directory of JSON-lines or
  CSV part files via the native Ray Data sinks. CSV cannot carry list
  columns (children/tokens) — they are JSON-encoded to strings first,
  mirroring how the reference serializes them into Postgres JSONB
  (db.py:524,589).
* Recency listing (S9/S10 list_stored_items): stored items sorted by
  last_crawled desc (db.py:224) — :func:`list_stored_items`.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def _stringify_lists(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            cols[name] = pa.array(
                [json.dumps(v) if v is not None else None for v in col.to_pylist()],
                pa.string(),
            )
        else:
            cols[name] = col
    return pa.table(cols)


def export_feed(ds: ray.data.Dataset, path: str, fmt: str = "json") -> str:
    """Write a feed export directory. fmt: 'json' (lines) or 'csv'."""
    if fmt == "json":
        ds.write_json(path)
    elif fmt == "csv":
        ds.map_batches(_stringify_lists, batch_format="pyarrow").write_csv(path)
    else:
        raise ValueError(f"unsupported feed format: {fmt}")
    return path


def list_stored_items(
    items_path: str, limit: int = 10, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Stored-item recency listing (reference db.py:224,
    storage_manager.py:38-62): newest ``limit`` items."""
    ds = ray.data.read_parquet(
        items_path, columns=columns or ["url", "title", "last_crawled"]
    )
    return ds.sort("last_crawled", descending=True).limit(limit)
