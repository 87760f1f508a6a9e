"""Feed exports (S12) + recency listing (S9/S10) tests."""

import json
import os

import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.sources.io import export_feed, list_stored_items


def _items():
    return pa.table(
        {
            "url": [f"http://a.ca/{i}" for i in range(6)],
            "title": [f"T{i}" for i in range(6)],
            "children": pa.array(
                [[f"http://a.ca/{i+1}"] for i in range(6)], pa.list_(pa.string())
            ),
            "last_crawled": pa.array(list(range(6)), pa.timestamp("us")),
        }
    )


def test_export_json(ray_session, tmp_path):
    p = export_feed(ray.data.from_arrow(_items()), str(tmp_path / "feed_json"), "json")
    rows = []
    for f in os.listdir(p):
        with open(os.path.join(p, f)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert len(rows) == 6
    assert rows[0]["children"] == ["http://a.ca/1"] or isinstance(
        rows[0]["children"], list
    )


def test_export_csv_stringifies_lists(ray_session, tmp_path):
    p = export_feed(ray.data.from_arrow(_items()), str(tmp_path / "feed_csv"), "csv")
    text = ""
    for f in os.listdir(p):
        with open(os.path.join(p, f)) as fh:
            text += fh.read()
    assert "http://a.ca/0" in text
    assert '[""http://a.ca/1""]' in text or '["http://a.ca/1"]' in text


def test_list_stored_items(ray_session, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "items"
    d.mkdir()
    pq.write_table(_items(), str(d / "part.parquet"))
    out = list_stored_items(str(d), limit=3).take_all()
    assert [r["url"] for r in out] == [
        "http://a.ca/5",
        "http://a.ca/4",
        "http://a.ca/3",
    ]


def test_export_bad_format(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        export_feed(ray.data.from_arrow(_items()), str(tmp_path / "x"), "xml")


def test_resolve_storage_mode_fallbacks():
    from louis_crawler_legacy_ray.sources.io import resolve_storage_mode

    assert resolve_storage_mode("s3", s3_available=True) == "s3"
    assert resolve_storage_mode("s3", s3_available=False) == "disk"
    assert resolve_storage_mode("database", db_available=False) == "disk"
    assert resolve_storage_mode("blob") == "disk"  # invalid -> disk
    assert resolve_storage_mode("DISK") == "disk"


def test_write_items_with_fallback(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from louis_crawler_legacy_ray.sources.io import write_items_with_fallback

    ds = ray.data.range(100)
    fallback = str(tmp_path / "fallback_items")
    # primary path is unwritable -> degrade to disk without losing rows
    res = write_items_with_fallback(ds, "/proc/denied/items", fallback)
    assert res["mode"] == "fallback"
    total = sum(
        pq.read_table(f"{fallback}/{f}").num_rows
        for f in __import__("os").listdir(fallback)
    )
    assert total == 100

    ok_dir = str(tmp_path / "primary_items")
    res2 = write_items_with_fallback(ray.data.range(10), ok_dir, fallback)
    assert res2["mode"] == "primary"
