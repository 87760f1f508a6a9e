"""WARC source/sink — the web-archive interchange format (ISO 28500 /
WARC/1.0), the container Common Crawl actually ships pages in.

The reference stores raw html in Postgres text columns / loose
``{uuid}.html`` files (louis/db.py:129-171); anyone operating at
web-archive scale ingests and emits WARC instead. This module writes a
pages Dataset (the input_hint schema: url, warc_ts, html) as standard
``response`` records and reads WARC files back into the same schema —
round-trip byte identity is oracle- and pytest-checked.

Format notes (kept strictly standard so external tools can read us):
  * each record: ``WARC/1.0`` + CRLF headers (WARC-Type,
    WARC-Record-ID, WARC-Date, WARC-Target-URI, Content-Type,
    Content-Length) + CRLF CRLF + the HTTP response block + CRLF CRLF;
  * the payload is a full ``HTTP/1.1 200 OK`` response with its own
    Content-Length — ``application/http; msgtype=response``;
  * ``gzip=True`` writes one gzip MEMBER per record concatenated into
    a ``.warc.gz`` (the Common Crawl convention — members are
    independently seekable); Python's gzip.decompress consumes
    multi-member streams natively on read;
  * record ids are DETERMINISTIC urn:uuid values derived from
    (url, date) so task retries rewrite identical bytes.

Scale shape: one ``.warc[.gz]`` part per input block, written inside
``map_batches`` with a content-hashed filename (idempotent under
re-execution) — a resumable partitioned layout, never one giant file.
Reading streams through ``read_binary_files`` + a flat per-file parse;
a WARC part is block-sized by construction so the parse stays in one
task's memory.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import ray.data

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    """WARC-Date (ISO 8601 Z) from microseconds since epoch."""
    import datetime as _dt

    return (
        _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    )


def _record(url: str, ts_us: int, html: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    date = _warc_date(ts_us)
    rid = uuid.UUID(
        bytes=hashlib.blake2b(
            (url + "|" + date).encode(), digest_size=16
        ).digest()
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">" + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_warc(
    pages: ray.data.Dataset, out_dir: str, gzip: bool = False
) -> ray.data.Dataset:
    """Write a pages Dataset as WARC parts (one per block). Returns the
    materialized manifest Dataset (path, n_records, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip else ".warc"

    def write_block(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        recs = [
            _record(u, t or 0, h or b"")
            for u, t, h in zip(b["url"].to_pylist(), ts, b["html"].to_pylist())
        ]
        if gzip:
            # mtime=0 keeps member bytes deterministic, so retries and
            # re-runs land on the same content-hashed filename
            blob = b"".join(_gzip.compress(r, mtime=0) for r in recs)
        else:
            blob = b"".join(recs)
        name = hashlib.blake2b(blob, digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic; retries rewrite identical bytes
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(recs)], pa.int64()),
                "n_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return pages.map_batches(write_block, batch_format="pyarrow").materialize()


def _iter_records(blob: bytes):
    """Scan one WARC file's bytes, yielding (headers, body) per record.
    Handles plain and (multi-member) gzip input; tolerates any
    standard header order."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gzip.decompress(blob)
    i = 0
    n = len(blob)
    while i < n:
        j = blob.find(b"WARC/", i)
        if j < 0:
            break
        he = blob.find(_CRLF + _CRLF, j)
        if he < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[j:he].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        body = blob[he + 4 : he + 4 + clen]
        i = he + 4 + clen
        yield headers, body


def _warc_ts_us(headers: dict[str, str]) -> int:
    import datetime as _dt

    if "warc-date" not in headers:
        return 0
    return int(
        _dt.datetime.strptime(headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )


def parse_warc_bytes(blob: bytes) -> list[tuple[str, int, bytes]]:
    """Parse one WARC file's bytes into (url, ts_us, html) tuples.
    Skips non-response records."""
    out: list[tuple[str, int, bytes]] = []
    for headers, body in _iter_records(blob):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _warc_ts_us(headers)
        hb = body.find(_CRLF + _CRLF)
        html = body[hb + 4 :] if hb >= 0 else b""
        out.append((url, ts, html))
    return out


def read_warc(path: str) -> ray.data.Dataset:
    """Read a WARC directory (or single file) back into the pages
    schema (url, warc_ts, html) — one parse task per file."""

    def parse(b: dict) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for blob in b["bytes"].to_pylist():
            for u, t, h in parse_warc_bytes(blob):
                urls.append(u)
                tss.append(t)
                htmls.append(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# WET — Common Crawl's extracted-plain-text companion artifact: WARC
# "conversion" records (text/plain payload, WARC-Refers-To the response
# record it was converted from). Same deterministic-id, gzip-member,
# content-hashed-part discipline as the response sink above.
# --------------------------------------------------------------------------


def _wet_record(url: str, ts_us: int, text: bytes) -> bytes:
    date = _warc_date(ts_us)
    rid = uuid.UUID(
        bytes=hashlib.blake2b(
            ("wet|" + url + "|" + date).encode(), digest_size=16
        ).digest()
    )
    ref = uuid.UUID(
        bytes=hashlib.blake2b(
            (url + "|" + date).encode(), digest_size=16
        ).digest()
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: conversion" + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">" + _CRLF
        + b"WARC-Refers-To: <urn:uuid:" + str(ref).encode() + b">" + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + b"Content-Length: " + str(len(text)).encode() + _CRLF
        + _CRLF
    )
    return head + text + _CRLF + _CRLF


def write_wet(
    texts: ray.data.Dataset,
    out_dir: str,
    gzip: bool = False,
    text_col: str = "text",
    ts_col: str | None = None,
) -> ray.data.Dataset:
    """Write a (url, text) Dataset as WET parts (one per input block,
    content-hashed idempotent filenames). Returns the materialized
    manifest Dataset (path, n_records, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if gzip else ".warc.wet"

    def write_block(b: pa.Table) -> pa.Table:
        if ts_col is not None:
            ts = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        else:
            ts = [0] * b.num_rows
        recs = [
            _wet_record(u, t or 0, (x or "").encode("utf-8"))
            for u, t, x in zip(
                b["url"].to_pylist(), ts, b[text_col].to_pylist()
            )
        ]
        if gzip:
            blob = b"".join(_gzip.compress(r, mtime=0) for r in recs)
        else:
            blob = b"".join(recs)
        name = hashlib.blake2b(blob, digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(recs)], pa.int64()),
                "n_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return texts.map_batches(write_block, batch_format="pyarrow").materialize()


def parse_wet_bytes(blob: bytes) -> list[tuple[str, int, str]]:
    """Parse one WET file's bytes into (url, ts_us, text) tuples.
    Skips non-conversion records; the payload IS the text (no HTTP
    block)."""
    out: list[tuple[str, int, str]] = []
    for headers, body in _iter_records(blob):
        if headers.get("warc-type") != "conversion":
            continue
        out.append(
            (
                headers.get("warc-target-uri", ""),
                _warc_ts_us(headers),
                body.decode("utf-8", "replace"),
            )
        )
    return out


def read_wet(path: str) -> ray.data.Dataset:
    """Read a WET directory (or single file) back into (url, wet_ts,
    text) — one parse task per file."""

    def parse(b: dict) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        texts: list[str] = []
        for blob in b["bytes"].to_pylist():
            for u, t, x in parse_wet_bytes(blob):
                urls.append(u)
                tss.append(t)
                texts.append(x)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "wet_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# WAT — Common Crawl's metadata companion artifact: WARC "metadata"
# records whose payload is a JSON envelope of the page's extracted
# metadata (title, outlinks). Deterministic: sort_keys + compact
# separators, so retries and re-runs produce identical bytes.
# --------------------------------------------------------------------------

import json as _json


def _wat_record(url: str, ts_us: int, meta: dict) -> bytes:
    payload = _json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": url},
                "Payload-Metadata": {"HTML-Metadata": meta},
            }
        },
        sort_keys=True,
        separators=(",", ":"),
    ).encode("utf-8")
    date = _warc_date(ts_us)
    rid = uuid.UUID(
        bytes=hashlib.blake2b(
            ("wat|" + url + "|" + date).encode(), digest_size=16
        ).digest()
    )
    ref = uuid.UUID(
        bytes=hashlib.blake2b(
            (url + "|" + date).encode(), digest_size=16
        ).digest()
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: metadata" + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">" + _CRLF
        + b"WARC-Refers-To: <urn:uuid:" + str(ref).encode() + b">" + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/json" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def write_wat(
    items: ray.data.Dataset,
    out_dir: str,
    gzip: bool = False,
    ts_col: str | None = None,
) -> ray.data.Dataset:
    """Write an extract-items Dataset (url, title, links) as WAT parts
    (one per block, content-hashed idempotent filenames)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wat.gz" if gzip else ".warc.wat"

    def write_block(b: pa.Table) -> pa.Table:
        if ts_col is not None:
            ts = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        else:
            ts = [0] * b.num_rows
        recs = [
            _wat_record(
                u,
                t or 0,
                {"Title": ti or "", "Links": [{"url": l} for l in (ls or [])]},
            )
            for u, t, ti, ls in zip(
                b["url"].to_pylist(),
                ts,
                b["title"].to_pylist(),
                b["links"].to_pylist(),
            )
        ]
        if gzip:
            blob = b"".join(_gzip.compress(r, mtime=0) for r in recs)
        else:
            blob = b"".join(recs)
        name = hashlib.blake2b(blob, digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(recs)], pa.int64()),
                "n_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return items.map_batches(write_block, batch_format="pyarrow").materialize()


def parse_wat_bytes(blob: bytes) -> list[tuple[str, int, str, list[str]]]:
    """Parse one WAT file's bytes into (url, ts_us, title, links)
    tuples. Skips non-metadata records."""
    out: list[tuple[str, int, str, list[str]]] = []
    for headers, body in _iter_records(blob):
        if headers.get("warc-type") != "metadata":
            continue
        env = _json.loads(body.decode("utf-8"))
        meta = env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
        out.append(
            (
                headers.get("warc-target-uri", ""),
                _warc_ts_us(headers),
                meta.get("Title", ""),
                [l["url"] for l in meta.get("Links", [])],
            )
        )
    return out


def read_wat(path: str) -> ray.data.Dataset:
    """Read a WAT directory (or single file) back into
    (url, wat_ts, title, links) — one parse task per file."""

    def parse(b: dict) -> pa.Table:
        urls, tss, titles, links = [], [], [], []
        for blob in b["bytes"].to_pylist():
            for u, t, ti, ls in parse_wat_bytes(blob):
                urls.append(u)
                tss.append(t)
                titles.append(ti)
                links.append(ls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "wat_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                "title": pa.array(titles, pa.string()),
                "links": pa.array(links, pa.list_(pa.string())),
            }
        )

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# revisit records — WARC's payload-digest deduplication (ISO 28500
# 'revisit' type with WARC-Refers-To-Date, the Wayback/Common-Crawl CDX
# dedup convention): a re-capture of a URL whose payload digest matches
# an earlier capture stores NO payload, only a pointer to the first
# capture. At archive scale this is the single biggest storage saver —
# most pages don't change between visits.
# --------------------------------------------------------------------------
def revisit_classify(captures: ray.data.Dataset) -> ray.data.Dataset:
    """Classify (url, warc_ts, html) captures into 'response' /
    'revisit' records: per (url, payload digest), the earliest capture
    is the stored response; every later identical capture becomes a
    revisit carrying refers_to_us = the response's timestamp. Digest
    rows shuffle once bucketed by digest (narrow int64 columns — the
    html bytes never move), then a vectorized per-bucket pandas fold
    picks firsts; a bucket owns all rows of its (url, digest) keys so
    the fold is exact. Returns (url, ts_us, record_type,
    refers_to_us) with refers_to_us = 0 on responses."""
    import hashlib as _h

    import pandas as pd

    from ..stages import from_pandas_clean

    def digest_rows(b: pa.Table) -> pa.Table:
        us = b["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64())
        dg = [
            int.from_bytes(_h.md5(h or b"").digest()[8:16], "little") - (1 << 63)
            for h in b["html"].to_pylist()
        ]
        return pa.table(
            {
                "url": b["url"],
                "ts_us": us,
                "digest": pa.array(dg, pa.int64()),
                "__b": pa.array([d % 64 for d in dg], pa.int64()),
            }
        )

    def per_bucket(g: "pd.DataFrame") -> pa.Table:
        df = g.sort_values(["url", "digest", "ts_us"], kind="mergesort")
        first = ~df.duplicated(["url", "digest"], keep="first")
        first_ts = df.groupby(["url", "digest"])["ts_us"].transform("min")
        return from_pandas_clean(
            pd.DataFrame(
                {
                    "url": df["url"].to_numpy(),
                    "ts_us": df["ts_us"].to_numpy(),
                    "record_type": np.where(first, "response", "revisit"),
                    "refers_to_us": np.where(
                        first, 0, first_ts.to_numpy()
                    ).astype("int64"),
                }
            )
        )

    return (
        captures.map_batches(digest_rows, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
