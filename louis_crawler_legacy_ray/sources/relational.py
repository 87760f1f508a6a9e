"""Relational upsert sink (S5 'database' storage mode, in-place DDL
parity).

The reference stores crawl/chunk/embedding items in Postgres with
``INSERT ... ON CONFLICT`` upserts (db.py:420-528: ``crawl_items``
unique on url, ``page_links`` unique on (source_url, destination_url),
``chunk_items``/``embedding_items`` append-only with a token_id FK).
SURVEY §2.1 maps that surface onto parquet keep-latest for the engine's
own pipelines; this module closes the loop for a user migrating *in
place* — same tables, same conflict semantics, against an actual SQL
database (DuckDB here; the statements are ANSI and carry to Postgres
verbatim modulo the UUID default).

Scale shape: a relational upsert is inherently a single-writer (or
small-pool) endpoint — the distributed part of the job is everything
UP TO the database. So the sink is two-phase:

1. **Stage (distributed)**: the Dataset's partitions stream to a
   parquet staging directory via ``write_parquet`` — each Ray task
   writes its own part file, no driver materialization, resumable.
2. **Merge (single writer)**: one ``INSERT INTO ... SELECT ... FROM
   read_parquet(staging/*) ON CONFLICT DO UPDATE`` per table. The
   in-batch keep-latest winner is chosen *inside* the merge SELECT
   (max last_crawled per url, ties to the lexically-largest title) so
   the upsert never touches a conflicting key twice in one statement.

On a real deployment phase 2 is the Postgres ``COPY``+merge a DBA
would write; its cost is O(result), not O(corpus), because phase 1
already reduced to one row per key.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import ray.data

_CRAWL_ITEMS_DDL = """
CREATE TABLE IF NOT EXISTS crawl_items (
    id UUID PRIMARY KEY DEFAULT uuid(),
    url TEXT UNIQUE NOT NULL,
    title TEXT,
    lang VARCHAR,
    html_content TEXT,
    last_crawled INTEGER,
    last_updated TEXT,
    children TEXT DEFAULT '[]',
    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""

_CHUNK_ITEMS_DDL = """
CREATE TABLE IF NOT EXISTS chunk_items (
    id UUID PRIMARY KEY DEFAULT uuid(),
    url TEXT NOT NULL,
    title TEXT,
    text_content TEXT,
    token_count INTEGER,
    tokens TEXT,
    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""

_EMBEDDING_ITEMS_DDL = """
CREATE TABLE IF NOT EXISTS embedding_items (
    id UUID PRIMARY KEY DEFAULT uuid(),
    token_id UUID NOT NULL,
    embedding DOUBLE[] NOT NULL,
    embedding_model TEXT NOT NULL,
    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""

_PAGE_LINKS_DDL = """
CREATE TABLE IF NOT EXISTS page_links (
    id UUID PRIMARY KEY DEFAULT uuid(),
    source_url TEXT NOT NULL,
    destination_url TEXT NOT NULL,
    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
    UNIQUE(source_url, destination_url)
)
"""


def create_schema(con) -> None:
    """Create the four reference tables (db.py:420-491). ``children``/
    ``tokens`` are JSON-encoded TEXT (Postgres JSONB -> portable JSON
    string); ``FLOAT8[]`` -> ``DOUBLE[]``; the uuid default is
    DuckDB's ``uuid()`` vs Postgres ``gen_random_uuid()``."""
    for ddl in (
        _CRAWL_ITEMS_DDL,
        _CHUNK_ITEMS_DDL,
        _EMBEDDING_ITEMS_DDL,
        _PAGE_LINKS_DDL,
    ):
        con.execute(ddl)
    # indexes mirroring db.py:485-489 (DuckDB ART indexes)
    con.execute(
        "CREATE INDEX IF NOT EXISTS idx_chunk_items_url ON chunk_items(url)"
    )
    con.execute(
        "CREATE INDEX IF NOT EXISTS idx_page_links_source"
        " ON page_links(source_url)"
    )


def _connect(db_path: str):
    import duckdb

    return duckdb.connect(db_path)


def _stage(ds: ray.data.Dataset, staging_dir: str | None) -> str:
    """Phase 1: distributed parquet staging (one part per task)."""
    staging = staging_dir or os.path.join(
        "/tmp", f"louis_relational_stage_{uuid.uuid4().hex[:12]}"
    )
    ds.write_parquet(staging)
    return staging


def _jsonify_list_columns(batch: pa.Table, columns: tuple[str, ...]) -> pa.Table:
    """JSON-encode list columns to strings (reference serializes
    children/tokens into JSONB the same way, db.py:524)."""
    out = {}
    for name in batch.column_names:
        col = batch[name]
        if name in columns and (
            pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
        ):
            out[name] = pa.array(
                [json.dumps(v) if v is not None else "[]" for v in col.to_pylist()],
                pa.string(),
            )
        else:
            out[name] = col
    return pa.table(out)


def upsert_crawl_items(
    ds: ray.data.Dataset,
    db_path: str,
    staging_dir: str | None = None,
) -> int:
    """Upsert crawl items by url with keep-latest semantics
    (store_crawl_item_to_database, db.py:494-528). Expects columns
    url, title, lang, html_content, last_crawled, last_updated,
    children (list<string> or pre-encoded JSON string). Returns the
    table's row count after the merge."""
    cols = [
        "url",
        "title",
        "lang",
        "html_content",
        "last_crawled",
        "last_updated",
        "children",
    ]
    present = [c for c in cols if c in ds.schema().names]
    staging = _stage(
        ds.select_columns(present).map_batches(
            lambda b: _jsonify_list_columns(b, ("children",)),
            batch_format="pyarrow",
        ),
        staging_dir,
    )
    con = _connect(db_path)
    try:
        create_schema(con)
        select_cols = ", ".join(present)
        # one winner per url inside the batch: the upsert statement may
        # only touch each conflicting key once
        con.execute(
            f"""
            INSERT INTO crawl_items ({select_cols})
            SELECT {select_cols} FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY url
                    ORDER BY last_crawled DESC, title DESC
                ) AS __rn
                FROM read_parquet('{staging}/*.parquet')
            ) WHERE __rn = 1
            ON CONFLICT (url) DO UPDATE SET
                title = EXCLUDED.title,
                lang = EXCLUDED.lang,
                html_content = EXCLUDED.html_content,
                last_crawled = EXCLUDED.last_crawled,
                last_updated = EXCLUDED.last_updated,
                children = EXCLUDED.children
            """
        )
        return con.execute("SELECT count(*) FROM crawl_items").fetchone()[0]
    finally:
        con.close()


def upsert_page_links(
    ds: ray.data.Dataset,
    db_path: str,
    staging_dir: str | None = None,
) -> int:
    """Insert-if-absent link edges (UNIQUE(source_url, destination_url),
    db.py:473-481 + store_page_link's ON CONFLICT DO NOTHING)."""
    staging = _stage(ds.select_columns(["source_url", "destination_url"]), staging_dir)
    con = _connect(db_path)
    try:
        create_schema(con)
        con.execute(
            f"""
            INSERT INTO page_links (source_url, destination_url)
            SELECT DISTINCT source_url, destination_url
            FROM read_parquet('{staging}/*.parquet')
            ON CONFLICT (source_url, destination_url) DO NOTHING
            """
        )
        return con.execute("SELECT count(*) FROM page_links").fetchone()[0]
    finally:
        con.close()


def insert_chunk_items(
    ds: ray.data.Dataset,
    db_path: str,
    staging_dir: str | None = None,
) -> int:
    """Append chunk items (db.py:449-460; append-only, id generated).
    Expects url, title, text_content, token_count, tokens."""
    cols = ["url", "title", "text_content", "token_count", "tokens"]
    present = [c for c in cols if c in ds.schema().names]
    staging = _stage(
        ds.select_columns(present).map_batches(
            lambda b: _jsonify_list_columns(b, ("tokens",)),
            batch_format="pyarrow",
        ),
        staging_dir,
    )
    con = _connect(db_path)
    try:
        create_schema(con)
        select_cols = ", ".join(present)
        con.execute(
            f"INSERT INTO chunk_items ({select_cols})"
            f" SELECT {select_cols} FROM read_parquet('{staging}/*.parquet')"
        )
        return con.execute("SELECT count(*) FROM chunk_items").fetchone()[0]
    finally:
        con.close()


def insert_embedding_items(
    ds: ray.data.Dataset,
    db_path: str,
    embedding_model: str,
    staging_dir: str | None = None,
) -> int:
    """Append embeddings keyed by chunk token_id (db.py:462-471).
    Expects token_id (string UUID) and embedding (list<double>)."""
    staging = _stage(ds.select_columns(["token_id", "embedding"]), staging_dir)
    con = _connect(db_path)
    try:
        create_schema(con)
        con.execute(
            f"""
            INSERT INTO embedding_items (token_id, embedding, embedding_model)
            SELECT CAST(token_id AS UUID), embedding, ?
            FROM read_parquet('{staging}/*.parquet')
            """,
            [embedding_model],
        )
        return con.execute("SELECT count(*) FROM embedding_items").fetchone()[0]
    finally:
        con.close()
