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


VALID_STORAGE_MODES = ("database", "disk", "s3")


def resolve_storage_mode(
    mode: str | None = None,
    s3_available: bool = True,
    db_available: bool = True,
) -> str:
    """Storage-mode selection with graceful degradation (reference
    db.py:35-57, S8): an invalid mode, or one whose backing dependency
    is unavailable, falls back to 'disk' rather than failing the
    pipeline. ``mode`` defaults to $CRAWLER_STORAGE_MODE."""
    import os

    mode = (mode or os.getenv("CRAWLER_STORAGE_MODE", "disk")).lower()
    if mode not in VALID_STORAGE_MODES:
        return "disk"
    if mode == "s3" and not s3_available:
        return "disk"
    if mode == "database" and not db_available:
        return "disk"
    return mode


def write_items_with_fallback(
    ds: ray.data.Dataset,
    primary_uri: str,
    fallback_dir: str,
) -> dict:
    """S8: write the items to the primary (object-store) URI; if the
    write fails — endpoint unreachable, credentials missing, bucket
    absent — fall back to the local disk directory, mirroring the
    reference's store_to_s3 -> store_to_disk degradation
    (db.py:227-283 with the db.py:44-55 fallback rule). Returns
    {'mode': 'primary'|'fallback', 'path': <where it landed>}.

    The Dataset is materialized once up front so a failed primary
    attempt does not recompute the pipeline for the fallback write."""
    ds = ds.materialize()
    try:
        ds.write_parquet(primary_uri)
        return {"mode": "primary", "path": primary_uri}
    except Exception:
        ds.write_parquet(fallback_dir)
        return {"mode": "fallback", "path": fallback_dir}


def store_items(
    ds: ray.data.Dataset,
    mode: str | None = None,
    *,
    db_path: str | None = None,
    disk_dir: str | None = None,
    s3_uri: str | None = None,
) -> dict:
    """Mode-dispatched item store (reference store_crawl_item,
    db.py:531-560: 'database' -> ON CONFLICT upsert, 'disk'/'s3' ->
    file store). 'database' routes through the relational upsert sink
    (sources/relational.py); unavailable backends degrade to disk per
    resolve_storage_mode. Returns {'mode', 'path', 'rows'}."""
    mode = resolve_storage_mode(
        mode,
        s3_available=s3_uri is not None,
        db_available=db_path is not None,
    )
    if mode == "database":
        from louis_crawler_legacy_ray.sources.relational import (
            upsert_crawl_items,
        )

        try:
            n = upsert_crawl_items(ds, db_path)
            return {"mode": "database", "path": db_path, "rows": n}
        except Exception:
            mode = "disk"  # db.py:44-55 degradation rule
    if mode == "s3":
        res = write_items_with_fallback(ds, s3_uri, disk_dir or "/tmp/louis_items")
        res["rows"] = None
        return res
    out = disk_dir or "/tmp/louis_items"
    ds.write_parquet(out)
    return {"mode": "disk", "path": out, "rows": None}


def list_stored_items(
    items_path: str, limit: int = 10, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Stored-item recency listing (reference db.py:224,
    storage_manager.py:38-62): newest ``limit`` items."""
    ds = ray.data.read_parquet(
        items_path, columns=columns or ["url", "title", "last_crawled"]
    )
    return ds.sort("last_crawled", descending=True).limit(limit)
