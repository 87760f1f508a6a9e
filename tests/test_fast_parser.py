"""Differential tests: the one-shot fast tokenizer (functions/dom.py
_fast_tokenize) must be byte-identical to the stdlib html.parser path
on serialization, text extraction, and node structure — on real
reference fixtures, adversarial hand-built cases, and random soup."""

import glob
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_ray.functions.dom import (
    Comment,
    Element,
    Text,
    parse_html,
    parse_html_stdlib,
    stripped_strings,
)

RESPONSES = "/root/reference/tests/responses"


def _shape(node) -> list:
    """Full structural fingerprint: tag/attrs for elements, exact data
    for text and comment nodes, in document order."""
    out = []

    def walk(el):
        for c in el.children:
            if isinstance(c, Text):
                out.append(("t", c.data))
            elif isinstance(c, Comment):
                out.append(("c", c.data))
            elif isinstance(c, Element):
                out.append(("e", c.name, sorted(
                    (k, v) for k, v in c.attrs.items() if isinstance(v, str)
                )))
                walk(c)

    walk(node)
    return out


def assert_parity(html: str) -> None:
    fast = parse_html(html)
    ref = parse_html_stdlib(html)
    assert _shape(fast) == _shape(ref), html[:200]
    assert fast.to_html() == ref.to_html()
    assert stripped_strings(fast) == stripped_strings(ref)


ADVERSARIAL = [
    "",
    "plain text only",
    "a < b and c > d &amp; e &nbsp; f",
    "<p>hi</p>",
    "<P CLASS='x'>MiXeD</P>",
    "<div a=1 b='2' c=\"3\" d>text</div>",
    "<div  a = 1   b>spaces</div>",
    "<img src='x.png'><br><hr/>",
    "<span attr='a\"b'>q</span>",
    '<span attr="a&amp;b&lt;c">ents in attr</span>',
    "<a href=/bare/path>bare</a>",
    "<script>if (a < b && c) { x = '&amp;'; }</script>after",
    "<SCRIPT>raw</SCRIPT>tail",
    "<script>never closed",
    "<style>p > a { color: red }</style>",
    "<script src='x'/>not-cdata</script>",
    "<!-- comment -->x<!-- multi\nline --->y",
    "<!-- unterminated comment",
    "<!DOCTYPE html><p>x</p>",
    "<!doctype html>",
    "<!bogus>x",
    "<!bogus never closed",
    "<?php echo 1 ?>x",
    "<?pi never closed",
    "</>empty endtag",
    "</ bogus>x",
    "</p extra junk>x",
    "</p",
    "<p<q>weird",
    "<p>a<p>b<p>c",  # unclosed nesting
    "<b><i>cross</b></i>nest",
    "<div>trailing <",
    "tail &",
    "text &amp",
    "&notareal; &amp; &#65; &#x42; &#; &#xZZ;",
    "<p>&Aacute;&aacute;&nbsp;&gt;</p>",
    "< notatag>",
    "<1notatag>",
    "<div att=''>empty</div>",
    "<div att=\"\">empty2</div>",
    "<div a='x' a='y'>dup</div>",
    "<td nowrap>old school</td>",
    "<input type=checkbox checked/>",
    "<div/>selfclose-nonvoid<span>s</span>",
    "<p >space before gt</p >",
    "<p\tattr=v\n>ws</p>",
    "<p att=v/>slash-bare",
    "<p att=v />slash-sep",
    "<a href='x'>1</a><a href=\"y\">2</a>",
    "<p>éè café &eacute;</p>",
    "<noscript><p>ns</p></noscript>",
    "<title>T &amp; T</title><p>b</p>",
    "<html><head><meta charset=utf-8></head><body><p>x</p></body></html>",
    "<p>unterminated tag at eof <span attr='v'",
    "<p>eof in tag <span",
    "<p>eof mid-attr <span a=",
    "x</p att='unclosed",
    "<svg><use xlink:href='#i'/></svg>",
    "<p data-x='1' DATA-Y=2>d</p>",
]


def test_adversarial_parity():
    for html in ADVERSARIAL:
        assert_parity(html)


def test_reference_fixture_parity():
    paths = sorted(glob.glob(os.path.join(RESPONSES, "*.html")))
    assert paths, "reference fixtures missing"
    for p in paths:
        with open(p, encoding="utf-8", errors="replace") as f:
            assert_parity(f.read())


_CHUNK = st.sampled_from(
    [
        "<p>", "</p>", "<div class='a b'>", "</div>", "<br>", "<br/>",
        "text", " ", "&amp;", "&nbsp;", "&#65;", "&", "<", ">", "'", '"',
        "<!--", "-->", "<!", "<?", "!", "<script>", "</script>",
        "<a href='x'>", "</a>", "<b i=", "v>", "/>", "=", "é", "\n",
        "<style>", "</style>", "<img src=x>", "</ p>", "<p a='&lt;'>",
    ]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_CHUNK, max_size=30))
def test_random_soup_parity(parts):
    assert_parity("".join(parts))
