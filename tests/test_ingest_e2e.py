"""End-to-end slice: synthetic pages -> Ray extract stage -> parquet,
with golden-value checks against the builder's expected outputs
(mirrors reference tests/test_goldie.py golden style at table scale)."""

import os

import pyarrow.parquet as pq
import pytest

from louis_crawler_legacy_ray.sources.pages import (
    build_page_html,
    child_ids,
    expected_clean_html,
    lang_segment,
    pages_from_documents,
    synth_documents,
    write_pages_parquet,
)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    docs = synth_documents(50, seed=7)
    pages = pages_from_documents(docs)
    d = tmp_path_factory.mktemp("pages")
    write_pages_parquet(pages, str(d), rows_per_file=16)
    return str(d), docs


def test_builder_expected_matches_kernel():
    """The builder's SQL-expressible expectation == the real cleaner."""
    from louis_crawler_legacy_ray.functions.html_kernels import clean_html

    docs = synth_documents(10, seed=3)
    n = docs.num_rows
    for i in (0, 3, 9):
        text = docs["text"][i].as_py()
        lang = docs["lang"][i].as_py()
        source = docs["source"][i].as_py()
        c1, c2 = child_ids(i, n)
        l1, s1 = docs["lang"][c1].as_py(), docs["source"][c1].as_py()
        l2, s2 = docs["lang"][c2].as_py(), docs["source"][c2].as_py()
        p1 = f"/{lang_segment(l1)}/{s1}/doc{c1}"
        p2 = f"/{lang_segment(l2)}/{s2}/doc{c2}"
        html = build_page_html(i, text, lang, source, p1, p2, pad_bytes=300)
        assert clean_html(html) == expected_clean_html(i, text, source, p1, p2)


def test_ingest_e2e(ray_session, tmp_path, pages_dir):
    from louis_crawler_legacy_ray.pipelines.ingest import ingest

    path, docs = pages_dir
    out = str(tmp_path / "out")
    res = ingest(path, out, now_us=1_700_000_000_000_000)

    items = pq.read_table(res["crawl_items"])
    assert items.num_rows == 50
    cols = set(items.column_names)
    assert {"url", "title", "lang", "html_content", "children", "links"} <= cols

    by_url = {
        u: (t, l, h)
        for u, t, l, h in zip(
            items["url"].to_pylist(),
            items["title"].to_pylist(),
            items["lang"].to_pylist(),
            items["html_content"].to_pylist(),
        )
    }
    # golden spot-check a row
    n = docs.num_rows
    i = 5
    text = docs["text"][i].as_py()
    lang = docs["lang"][i].as_py()
    source = docs["source"][i].as_py()
    c1, c2 = child_ids(i, n)
    p1 = f"/{lang_segment(docs['lang'][c1].as_py())}/{docs['source'][c1].as_py()}/doc{c1}"
    p2 = f"/{lang_segment(docs['lang'][c2].as_py())}/{docs['source'][c2].as_py()}/doc{c2}"
    url = f"http://inspection.canada.ca/{lang_segment(lang)}/{source}/doc{i}"
    assert url in by_url
    title, out_lang, html_content = by_url[url]
    assert title == f"Doc {i} {source}"
    assert out_lang == ("fr" if lang == "fr" else "en")
    assert html_content == expected_clean_html(i, text, source, p1, p2)

    # edges: each page links to exactly 2 distinct children (dup filtered)
    links = pq.read_table(res["links"])
    assert links.num_rows == 100  # 50 pages x 2 distinct dsts (after dedup)
    assert set(links.column_names) == {"src", "dst", "depth"}
    # every dst is an absolute canonical site url
    assert all(d.startswith("http://inspection.canada.ca/") for d in links["dst"].to_pylist())


def test_ingest_output_is_partitioned(ray_session, tmp_path, pages_dir):
    """Resumable-output contract: parquet directory, multiple part files."""
    from louis_crawler_legacy_ray.pipelines.ingest import ingest

    path, _ = pages_dir
    out = str(tmp_path / "out2")
    res = ingest(path, out, write_edges=False)
    files = os.listdir(res["crawl_items"])
    assert len([f for f in files if f.endswith(".parquet")]) >= 1
