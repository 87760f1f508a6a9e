"""WARC sink/source beyond the roundtrip oracle: standard framing,
deterministic record ids, gzip member handling, non-response records
skipped, empty payloads, and idempotent part filenames."""

import gzip
import os

import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.sources.warc import (
    _record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _pages(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _, _ in rows], pa.string()),
                "warc_ts": pa.array(
                    [t for _, t, _ in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "html": pa.array([h for _, _, h in rows], pa.binary()),
            }
        )
    )


def test_record_framing_is_standard():
    rec = _record("http://a/x", 1_700_000_000_000_000, b"<html>hi</html>")
    text = rec.decode()
    assert text.startswith("WARC/1.0\r\n")
    assert "WARC-Type: response\r\n" in text
    assert "WARC-Target-URI: http://a/x\r\n" in text
    assert "Content-Type: application/http; msgtype=response\r\n" in text
    assert rec.endswith(b"<html>hi</html>\r\n\r\n")
    # the declared record Content-Length covers exactly the HTTP block
    head, _, rest = rec.partition(b"\r\n\r\n")
    clen = int(
        [l for l in head.split(b"\r\n") if l.startswith(b"Content-Length")][0]
        .split(b":")[1]
    )
    assert rest == rest[:clen] + b"\r\n\r\n"
    # deterministic record id: same (url, ts) -> identical bytes
    assert rec == _record("http://a/x", 1_700_000_000_000_000, b"<html>hi</html>")


def test_parse_skips_non_response_and_handles_empty():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://a/req\r\nContent-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    resp = _record("http://a/x", 0, b"")
    got = parse_warc_bytes(req + resp)
    assert got == [("http://a/x", 0, b"")]


def test_gzip_members_roundtrip():
    recs = [_record(f"http://a/{i}", i * 1_000_000, b"x" * i) for i in range(5)]
    blob = b"".join(gzip.compress(r) for r in recs)
    got = parse_warc_bytes(blob)
    assert [u for u, _, _ in got] == [f"http://a/{i}" for i in range(5)]
    assert [len(h) for _, _, h in got] == list(range(5))


def test_write_read_dataset_roundtrip(ray_session, tmp_path):
    rows = [
        (f"http://h{i % 3}.ex/p{i}", i * 1_000_000, f"<p>{i}</p>".encode())
        for i in range(40)
    ]
    out = str(tmp_path / "warc")
    man = write_warc(_pages(rows).repartition(4), out, gzip=True)
    assert man.sum("n_records") == 40
    assert all(p.endswith(".warc.gz") for p in man.to_pandas()["path"])
    back = sorted(
        read_warc(out).take_all(), key=lambda r: r["url"]
    )
    src = sorted(rows)
    assert [(r["url"], r["html"]) for r in back] == [
        (u, h) for u, _, h in src
    ]
    # idempotent parts: rewriting the same data adds no new files
    n_before = len(os.listdir(out))
    write_warc(_pages(rows).repartition(4), out, gzip=True)
    assert len(os.listdir(out)) == n_before


def test_wet_record_framing_and_refers_to():
    from louis_crawler_legacy_ray.sources.warc import _record, _wet_record, parse_wet_bytes

    rec = _wet_record("http://a/x", 1_700_000_000_000_000, b"plain text here")
    text = rec.decode()
    assert text.startswith("WARC/1.0\r\n")
    assert "WARC-Type: conversion\r\n" in text
    assert "Content-Type: text/plain\r\n" in text
    assert rec.endswith(b"plain text here\r\n\r\n")
    # WARC-Refers-To matches the response record's deterministic id
    resp = _record("http://a/x", 1_700_000_000_000_000, b"<p>x</p>").decode()
    rid = [l for l in resp.split("\r\n") if l.startswith("WARC-Record-ID:")][0]
    ref = [l for l in text.split("\r\n") if l.startswith("WARC-Refers-To:")][0]
    assert ref.split(": ", 1)[1] == rid.split(": ", 1)[1]
    # parser returns the payload verbatim and skips response records
    got = parse_wet_bytes(rec + _record("http://a/y", 0, b"<p>y</p>"))
    assert got == [("http://a/x", 1_700_000_000_000_000, "plain text here")]


def test_wet_roundtrip_through_ray(ray_session, tmp_path):
    from louis_crawler_legacy_ray.sources.warc import read_wet, write_wet

    t = pa.table(
        {
            "url": pa.array(["http://h/a", "http://h/b", "http://h/c"]),
            "text": pa.array(["alpha beta", "", "géo ünïcode"]),
        }
    )
    out = str(tmp_path / "wet")
    m = write_wet(ray.data.from_arrow(t), out, gzip=True).to_pandas()
    assert m["n_records"].sum() == 3
    assert all(p.endswith(".warc.wet.gz") for p in m["path"])
    back = read_wet(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == ["http://h/a", "http://h/b", "http://h/c"]
    assert list(back["text"]) == ["alpha beta", "", "géo ünïcode"]


def test_wat_record_framing_and_roundtrip(ray_session, tmp_path):
    from louis_crawler_legacy_ray.sources.warc import (
        _record,
        _wat_record,
        parse_wat_bytes,
        read_wat,
        write_wat,
    )

    rec = _wat_record("http://a/x", 0, {"Title": "T", "Links": [{"url": "http://a/y"}]})
    text = rec.decode()
    assert "WARC-Type: metadata\r\n" in text
    assert "Content-Type: application/json\r\n" in text
    # refers-to id matches the response record's deterministic id
    resp = _record("http://a/x", 0, b"<p>x</p>").decode()
    rid = [l for l in resp.split("\r\n") if l.startswith("WARC-Record-ID:")][0]
    ref = [l for l in text.split("\r\n") if l.startswith("WARC-Refers-To:")][0]
    assert ref.split(": ", 1)[1] == rid.split(": ", 1)[1]
    # parser skips response records, keeps metadata ones
    assert parse_wat_bytes(rec + _record("http://a/y", 0, b"z")) == [
        ("http://a/x", 0, "T", ["http://a/y"])
    ]
    # ray roundtrip
    t = pa.table(
        {
            "url": pa.array(["http://h/a", "http://h/b"]),
            "title": pa.array(["A", ""]),
            "links": pa.array([["http://h/b"], []], pa.list_(pa.string())),
        }
    )
    out = str(tmp_path / "wat")
    m = write_wat(ray.data.from_arrow(t), out, gzip=True).to_pandas()
    assert m["n_records"].sum() == 2
    back = read_wat(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["title"]) == ["A", ""]
    assert [list(x) for x in back["links"]] == [["http://h/b"], []]


def test_revisit_classify_semantics(ray_session):
    """revisit_classify: earliest capture per (url, digest) is the
    response, later identical captures become revisits pointing at it;
    a changed payload restarts as a response; block layout invariant."""
    import ray.data as rd

    from louis_crawler_legacy_ray.sources.warc import revisit_classify

    rows = [
        ("http://a/x", 100, b"<p>same</p>"),
        ("http://a/x", 300, b"<p>same</p>"),   # revisit -> 100
        ("http://a/x", 200, b"<p>same</p>"),   # revisit -> 100 (out of order)
        ("http://a/x", 400, b"<p>new</p>"),    # digest changed -> response
        ("http://b/y", 100, b"<p>same</p>"),   # same bytes, other url -> response
    ]
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    for nblocks in (1, 5):
        out = revisit_classify(
            rd.from_arrow(tbl).repartition(nblocks)
        ).take_all()
        got = {
            (r["url"], r["ts_us"]): (r["record_type"], r["refers_to_us"])
            for r in out
        }
        assert got == {
            ("http://a/x", 100): ("response", 0),
            ("http://a/x", 200): ("revisit", 100),
            ("http://a/x", 300): ("revisit", 100),
            ("http://a/x", 400): ("response", 0),
            ("http://b/y", 100): ("response", 0),
        }
