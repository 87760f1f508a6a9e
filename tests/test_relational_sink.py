"""Relational upsert sink (S5 'database' mode) — DuckDB DDL/upsert
parity with the reference's Postgres tables (db.py:420-528)."""

import duckdb
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.sources.relational import (
    create_schema,
    insert_chunk_items,
    insert_embedding_items,
    upsert_crawl_items,
    upsert_page_links,
)


def _items(last_crawled_base=100):
    return pa.table(
        {
            "url": [f"http://a.ca/{i}" for i in range(4)] + ["http://a.ca/0"],
            "title": ["T0", "T1", "T2", "T3", "T0-new"],
            "lang": ["en"] * 5,
            "html_content": [f"<p>{i}</p>" for i in range(5)],
            "last_crawled": pa.array(
                [last_crawled_base + i for i in range(4)]
                + [last_crawled_base + 50],
                pa.int32(),
            ),
            "last_updated": ["2024-01-01"] * 5,
            "children": pa.array(
                [[f"http://a.ca/{i + 1}"] for i in range(5)],
                pa.list_(pa.string()),
            ),
        }
    )


def test_schema_matches_reference_tables(tmp_path):
    con = duckdb.connect(str(tmp_path / "louis.duckdb"))
    create_schema(con)
    tables = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
    assert {"crawl_items", "chunk_items", "embedding_items", "page_links"} <= tables
    cols = dict(
        con.execute(
            "SELECT column_name, data_type FROM information_schema.columns"
            " WHERE table_name='crawl_items'"
        ).fetchall()
    )
    # db.py:423-433 column surface
    for c in (
        "id",
        "url",
        "title",
        "lang",
        "html_content",
        "last_crawled",
        "last_updated",
        "children",
        "created_at",
    ):
        assert c in cols
    con.close()


def test_upsert_crawl_items_keep_latest_in_batch(ray_session, tmp_path):
    db = str(tmp_path / "louis.duckdb")
    # the batch itself holds a url twice — the higher last_crawled wins
    n = upsert_crawl_items(
        ray.data.from_arrow(_items()), db, staging_dir=str(tmp_path / "s1")
    )
    assert n == 4
    con = duckdb.connect(db)
    row = con.execute(
        "SELECT title, last_crawled, children FROM crawl_items"
        " WHERE url='http://a.ca/0'"
    ).fetchone()
    assert row[0] == "T0-new" and row[1] == 150
    assert row[2] == '["http://a.ca/5"]'
    con.close()


def test_upsert_crawl_items_conflict_updates(ray_session, tmp_path):
    db = str(tmp_path / "louis.duckdb")
    upsert_crawl_items(
        ray.data.from_arrow(_items(100)), db, staging_dir=str(tmp_path / "s1")
    )
    # second wave: same urls, newer content — ON CONFLICT DO UPDATE
    n = upsert_crawl_items(
        ray.data.from_arrow(_items(500)), db, staging_dir=str(tmp_path / "s2")
    )
    assert n == 4  # still unique on url
    con = duckdb.connect(db)
    got = con.execute(
        "SELECT url, last_crawled FROM crawl_items ORDER BY url"
    ).fetchall()
    assert [r[1] for r in got] == [550, 501, 502, 503]
    con.close()


def test_upsert_page_links_dedup(ray_session, tmp_path):
    db = str(tmp_path / "louis.duckdb")
    edges = pa.table(
        {
            "source_url": ["a", "a", "b", "a"],
            "destination_url": ["b", "b", "c", "c"],
        }
    )
    n = upsert_page_links(
        ray.data.from_arrow(edges), db, staging_dir=str(tmp_path / "e1")
    )
    assert n == 3
    # replay is idempotent (ON CONFLICT DO NOTHING)
    n = upsert_page_links(
        ray.data.from_arrow(edges), db, staging_dir=str(tmp_path / "e2")
    )
    assert n == 3


def test_chunk_and_embedding_fk_roundtrip(ray_session, tmp_path):
    db = str(tmp_path / "louis.duckdb")
    chunks = pa.table(
        {
            "url": ["http://a.ca/0", "http://a.ca/0"],
            "title": ["T0", "T0"],
            "text_content": ["alpha beta", "gamma"],
            "token_count": pa.array([2, 1], pa.int32()),
            "tokens": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
        }
    )
    assert (
        insert_chunk_items(
            ray.data.from_arrow(chunks), db, staging_dir=str(tmp_path / "c1")
        )
        == 2
    )
    con = duckdb.connect(db)
    ids = [str(r[0]) for r in con.execute("SELECT id FROM chunk_items").fetchall()]
    tokens = con.execute(
        "SELECT tokens FROM chunk_items ORDER BY token_count DESC LIMIT 1"
    ).fetchone()[0]
    assert tokens == "[1, 2]"
    con.close()
    embs = pa.table(
        {
            "token_id": ids,
            "embedding": pa.array([[0.1, 0.2]] * len(ids), pa.list_(pa.float64())),
        }
    )
    assert (
        insert_embedding_items(
            ray.data.from_arrow(embs),
            db,
            "stub-model",
            staging_dir=str(tmp_path / "m1"),
        )
        == 2
    )
    con = duckdb.connect(db)
    joined = con.execute(
        "SELECT count(*) FROM embedding_items e JOIN chunk_items c"
        " ON e.token_id = c.id WHERE e.embedding_model='stub-model'"
    ).fetchone()[0]
    assert joined == 2
    con.close()


def test_storage_mode_database_available(tmp_path):
    """resolve_storage_mode('database') no longer needs to degrade —
    the sink exists (db.py:35-57 fallback still applies when the DB
    is unreachable)."""
    from louis_crawler_legacy_ray.sources.io import resolve_storage_mode

    assert resolve_storage_mode("database", db_available=True) == "database"
    assert resolve_storage_mode("database", db_available=False) == "disk"


def test_store_items_database_mode_and_degradation(ray_session, tmp_path):
    """store_items dispatches 'database' to the upsert sink and
    degrades to disk when the DB path is missing (db.py:531-560)."""
    from louis_crawler_legacy_ray.sources.io import store_items

    ds = ray.data.from_arrow(_items())
    res = store_items(ds, "database", db_path=str(tmp_path / "m.duckdb"))
    assert res["mode"] == "database" and res["rows"] == 4
    # no db_path -> resolve_storage_mode degrades before touching duckdb
    res = store_items(
        ray.data.from_arrow(_items()),
        "database",
        disk_dir=str(tmp_path / "disk_items"),
    )
    assert res["mode"] == "disk"
    import os

    assert os.path.isdir(str(tmp_path / "disk_items"))
