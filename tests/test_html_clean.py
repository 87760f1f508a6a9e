"""Golden tests for the HTML cleaning/extraction kernels, mirroring the
reference's golden-fixture style (tests/test_goldie.py:35-86): exact
cleaned-output strings, exact titles, exact children lists."""

from louis_crawler_legacy_ray.functions.dom import parse_html
from louis_crawler_legacy_ray.functions.html_kernels import (
    clean_html,
    extract_last_updated,
    extract_page,
    extract_title,
    normalize_ws,
)

FIXTURE = """<!DOCTYPE html>
<html lang="en">
<head><title>  Food   safety </title><title>CFIA</title></head>
<body>
  <nav>site nav</nav>
  <main class="container">
    <h1>Food safety</h1>
    <!-- internal note -->
    <aside>related links</aside>
    <div class="pagedetails">page meta</div>
    <script>var x = 1;</script>
    <div class="nojs-hide">enable js</div>
    <div class="alert">alert!</div>
    <p>Inspect   your food.</p>
    <time>2023-06-01</time>
    <a href="/en/a">A</a>
    <a href="/en/b#frag">B</a>
    <a href="mailto:x@cfia.ca">mail</a>
    <a href="doc.pdf">pdf</a>
  </main>
  <footer>footer text</footer>
</body>
</html>"""


def test_clean_html_golden():
    out = clean_html(FIXTURE)
    assert out == (
        '<html><body><main class="container"> <h1>Food safety</h1> '
        "<p>Inspect your food.</p> <time>2023-06-01</time> "
        '<a href="/en/a">A</a> <a href="/en/b#frag">B</a> '
        '<a href="mailto:x@cfia.ca">mail</a> <a href="doc.pdf">pdf</a> '
        "</main></body></html>"
    )
    # noise selectors and comments never survive
    for noise in ("aside", "pagedetails", "script", "nojs-hide", "alert", "<!--"):
        assert noise not in out
    # whitespace fully collapsed
    assert "  " not in out


def test_title_joins_all_titles():
    doc = parse_html(FIXTURE)
    assert extract_title(doc) == "Food safety CFIA"


def test_last_updated_first_time_element():
    doc = parse_html(FIXTURE)
    assert extract_last_updated(doc) == "2023-06-01"
    assert extract_last_updated(parse_html("<main><p>x</p></main>")) is None


def test_extract_page_record():
    rec = extract_page("https://inspection.gc.ca/en/page", FIXTURE, now=1234)
    assert rec["url"] == "http://inspection.canada.ca/en/page"
    assert rec["lang"] == "en"
    assert rec["title"] == "Food safety CFIA"
    assert rec["last_crawled"] == 1234
    # children: M3 — mailto dropped, others urljoined against the raw
    # response url (reference applies fix_vhost to the page url only,
    # goldie.py:14,22-27 — children keep the original vhost)
    assert rec["children"] == [
        "https://inspection.gc.ca/en/a",
        "https://inspection.gc.ca/en/b#frag",
        "https://inspection.gc.ca/en/doc.pdf",
    ]
    # links: M2 — pdf dropped, fragment stripped
    assert rec["links"] == [
        "http://inspection.canada.ca/en/a",
        "http://inspection.canada.ca/en/b",
    ]


def test_no_main_returns_empty():
    assert clean_html("<html><body><p>no main</p></body></html>") == ""


def test_normalize_ws():
    assert normalize_ws("  a\t\n b\r\nc  ") == "a b c"


def test_fra_url_language():
    rec = extract_page("http://inspection.canada.ca/fra/page", "<main><p>x</p></main>")
    assert rec["lang"] == "fr"


def test_extract_anchors_rules():
    from louis_crawler_legacy_ray.functions.html_kernels import extract_anchors

    h = (
        '<html><body>'
        '<a href="http://x.ca/a">  next\n page </a>'
        '<a href="#top">top</a>'
        '<a href="mailto:a@b">mail</a>'
        '<a href="/p">rel</a>'
        '<a href="/f.pdf">pdf</a>'
        '<a href="http://x.ca/a?q=1">dup</a>'
        '<a>no href</a>'
        '</body></html>'
    )
    got = extract_anchors("http://base.ca/page", h)
    assert got == [
        ("http://x.ca/a", "next page"),   # ws-normalized text
        ("http://base.ca/p", "rel"),      # site-relative resolved
        ("http://x.ca/a", "dup"),         # query stripped -> same target
    ]
