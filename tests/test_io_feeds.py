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
