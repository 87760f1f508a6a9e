"""A minimal mutable DOM on stdlib ``html.parser``.

bs4/lxml are not available in this environment, so this module provides
the small subset of soup functionality the reference's kernels need
(louis/crawler/spiders/goldie.py:47-61 cleaning and
louis/crawler/chunking.py heading-block grouping):

  - parse HTML into an element tree (comments preserved as nodes)
  - select by tag name / css class; remove subtrees; strip comments
  - serialize back to HTML (attrs in insertion order)
  - get_text, document-order traversal, sibling/parent navigation
  - mutations used by the chunker: wrap / unwrap / append (move)

The serializer matches ``str(BeautifulSoup(..., 'lxml'))`` output rules
byte-for-byte on well-formed input (reference tests/test_goldie.py:46-50
pins the literal bytes): attributes sorted alphabetically (bs4
Tag.decode sorts attrs.items()), text re-escaped with bs4's 'minimal'
formatter (& < > only; non-ASCII such as NBSP emitted literally),
attribute values escaped + quoted via bs4's quoted_attribute_value
(prefer double quotes; single quotes when the value contains '"';
&quot; when it contains both), script/style contents emitted raw (bs4
skips entity substitution inside Script/Stylesheet strings), void
elements as ``<br/>``. Verified against the reference's real fixture
corpus in tests/test_golden_reference.py.
"""

from __future__ import annotations

from html.parser import HTMLParser

# bs4 'minimal' formatter (EntitySubstitution.substitute_xml): only
# & < > are escaped in text; quotes and non-ASCII pass through.
_TEXT_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def escape_text(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s


def quote_attr(value: str) -> str:
    """bs4 EntitySubstitution.quoted_attribute_value: substitute_xml on
    the value, then pick the quote char."""
    value = escape_text(value)
    quote = '"'
    if '"' in value:
        if "'" in value:
            value = value.replace('"', "&quot;")
        else:
            quote = "'"
    return f"{quote}{value}{quote}"


# contents of these elements are CDATA-like: bs4 marks their strings
# Script/Stylesheet and skips entity substitution on output.
_RAW_TEXT_TAGS = frozenset({"script", "style"})

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class Text:
    __slots__ = ("data", "parent")

    def __init__(self, data: str):
        self.data = data
        self.parent: Element | None = None

    @property
    def name(self):  # text nodes have no tag name (mirrors soup strings)
        return None

    def serialize(self, out: list[str], raw: bool = False) -> None:
        out.append(self.data if raw else escape_text(self.data))

    def __repr__(self):
        return f"Text({self.data!r})"


class Comment:
    __slots__ = ("data", "parent")

    def __init__(self, data: str):
        self.data = data
        self.parent: Element | None = None

    @property
    def name(self):
        return None

    def serialize(self, out: list[str], raw: bool = False) -> None:
        out.append(f"<!--{self.data}-->")

    def __repr__(self):
        return f"Comment({self.data!r})"


class Element:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict | None = None):
        self.name = name
        # attrs may hold non-string values (the chunker caches token lists
        # in attrs, mirroring chunking.py:14-36); only string values are
        # serialized.
        self.attrs: dict = dict(attrs) if attrs else {}
        self.children: list = []
        self.parent: Element | None = None

    # -- construction ------------------------------------------------
    def append(self, node) -> None:
        """Append node, detaching it from any previous parent (move
        semantics, like soup's PageElement.append)."""
        if node.parent is not None:
            node.parent.children.remove(node)
        node.parent = self
        self.children.append(node)

    # -- queries -----------------------------------------------------
    def classes(self) -> list[str]:
        cls = self.attrs.get("class", [])
        if isinstance(cls, str):
            return cls.split()
        return list(cls)

    def has_class(self, name: str) -> bool:
        return name in self.classes()

    def iter_elements(self):
        """All descendant Elements in document order (self excluded)."""
        for child in self.children:
            if isinstance(child, Element):
                yield child
                yield from child.iter_elements()

    def iter_nodes(self):
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child.iter_nodes()

    def find_all(self, matcher) -> list["Element"]:
        """matcher: callable(Element) -> bool, or a tag-name string."""
        if isinstance(matcher, str):
            tag = matcher
            matcher = lambda e: e.name == tag  # noqa: E731
        return [e for e in self.iter_elements() if matcher(e)]

    def find(self, matcher):
        """First matching descendant, short-circuiting the traversal."""
        if isinstance(matcher, str):
            tag = matcher
            matcher = lambda e: e.name == tag  # noqa: E731
        for e in self.iter_elements():
            if matcher(e):
                return e
        return None

    def select_class(self, cls: str) -> list["Element"]:
        return self.find_all(lambda e: e.has_class(cls))

    def find_next_siblings(self) -> list:
        """Following sibling Elements (tag siblings only, like soup's
        find_next_siblings)."""
        if self.parent is None:
            return []
        sibs = self.parent.children
        idx = sibs.index(self)
        return [s for s in sibs[idx + 1 :] if isinstance(s, Element)]

    def next_siblings_all(self) -> list:
        """All following sibling nodes incl. text (soup .next_siblings)."""
        if self.parent is None:
            return []
        sibs = self.parent.children
        idx = sibs.index(self)
        return list(sibs[idx + 1 :])

    def find_next_sibling_class(self, cls: str):
        for s in self.next_siblings_all():
            if isinstance(s, Element) and s.has_class(cls):
                return s
        return None

    def find_parent_class(self, cls: str):
        node = self.parent
        while node is not None:
            if node.has_class(cls):
                return node
            node = node.parent
        return None

    # -- mutation ----------------------------------------------------
    def extract(self) -> None:
        """Remove this subtree from its parent."""
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def unwrap(self) -> None:
        """Replace this element by its children (soup .unwrap)."""
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        kids = list(self.children)
        for k in kids:
            k.parent = self.parent
        self.parent.children[idx : idx + 1] = kids
        self.children = []
        self.parent = None

    def wrap(self, wrapper: "Element") -> "Element":
        """Wrap this element in wrapper, in place (soup .wrap)."""
        parent = self.parent
        if parent is not None:
            idx = parent.children.index(self)
            parent.children[idx] = wrapper
            wrapper.parent = parent
        self.parent = wrapper
        wrapper.children.append(self)
        return wrapper

    # -- text / serialization ---------------------------------------
    def get_text(self) -> str:
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        for child in self.children:
            if isinstance(child, Text):
                out.append(child.data)
            elif isinstance(child, Element):
                child._collect_text(out)
            # comments contribute no text

    def serialize(self, out: list[str], skip_comments: bool = False) -> None:
        # bs4 Tag.decode sorts attributes alphabetically on output —
        # the reference's golden bytes depend on it (test_goldie.py:48:
        # source order property,class,typeof serializes class,property,typeof)
        attrs = "".join(
            f" {k}={quote_attr(v)}"
            for k, v in sorted(self.attrs.items())
            if isinstance(v, str)
        )
        if self.name in VOID_ELEMENTS and not self.children:
            out.append(f"<{self.name}{attrs}/>")
            return
        out.append(f"<{self.name}{attrs}>")
        raw = self.name in _RAW_TEXT_TAGS
        for child in self.children:
            if skip_comments and isinstance(child, Comment):
                continue
            if isinstance(child, Element):
                child.serialize(out, skip_comments)
            else:
                child.serialize(out, raw)
        out.append(f"</{self.name}>")

    def to_html(self, skip_comments: bool = False) -> str:
        out: list[str] = []
        self.serialize(out, skip_comments)
        return "".join(out)

    def inner_html(self) -> str:
        out: list[str] = []
        raw = self.name in _RAW_TEXT_TAGS
        for child in self.children:
            if isinstance(child, Element):
                child.serialize(out)
            else:
                child.serialize(out, raw)
        return "".join(out)

    def __repr__(self):
        return f"<{self.name} {self.attrs.get('class', '')}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag):
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Text(data))

    def handle_comment(self, data):
        self.stack[-1].append(Comment(data))


def parse_html_stdlib(html: str) -> Element:
    """Reference parse on stdlib html.parser (the semantics oracle for
    the fast tokenizer below; kept callable for differential tests)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# one-shot fast tokenizer
#
# html.parser is the hot 69% of the extract kernel (28 KB page ≈ 0.33 ms
# parse): its generality — incremental feeds, updatepos line tracking,
# charref-split buffering, double-scanning every start tag — is all
# overhead when the whole document is in hand.  _fast_tokenize mirrors
# HTMLParser(convert_charrefs=True) semantics exactly (same tolerant
# regexes, same endtag/bogus-comment/CDATA/EOF-recovery behavior,
# verified by byte-parity differential tests against parse_html_stdlib
# in tests/test_fast_parser.py and by the reference-fixture goldens) in
# a single forward pass.  Inputs containing marked sections ("<![") and
# any input that raises fall back to the stdlib path.
# ---------------------------------------------------------------------------

import re as _re
from html import unescape as _unescape

_TAGFIND = _re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = _re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_LOCATE_START = _re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    _re.VERBOSE,
)
# fast path for the overwhelmingly common attr-less tag (<p>, <li>, …)
_SIMPLE_START = _re.compile(r"<([a-zA-Z][a-zA-Z0-9-]*)>")
_ENDTAGFIND = _re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_CDATA_CLOSE = {
    t: _re.compile(r"</\s*%s\s*>" % t, _re.I) for t in _RAW_TEXT_TAGS
}
_STARTTAG_OPEN = _re.compile("<[a-zA-Z]")
_COMMENT_CLOSE = _re.compile(r"--\s*>")


def _fast_tokenize(s: str, b: _TreeBuilder) -> None:
    n = len(s)
    i = 0
    data = b.handle_data
    cdata_elem: str | None = None
    while i < n:
        if cdata_elem is not None:
            m = _CDATA_CLOSE[cdata_elem].search(s, i)
            if m is None:
                return  # unterminated CDATA content is dropped (stdlib)
            if i < m.start():
                data(s[i : m.start()])
            b.handle_endtag(cdata_elem)
            cdata_elem = None
            i = m.end()
            continue
        j = s.find("<", i)
        if j < 0:
            j = n
        if i < j:
            data(_unescape(s[i:j]))
        if j == n:
            return
        i = j
        nc = s[i + 1 : i + 2]
        k = -1
        if nc and (("a" <= nc <= "z") or ("A" <= nc <= "Z")):
            # ---- start tag (mirrors parse_starttag) ----
            sm = _SIMPLE_START.match(s, i)
            if sm is not None:  # attr-less <tag>: skip locate+attr scan
                tag = sm.group(1).lower()
                el = Element(tag)
                b.stack[-1].append(el)
                if tag not in VOID_ELEMENTS:
                    b.stack.append(el)
                if tag in _RAW_TEXT_TAGS:
                    cdata_elem = tag
                i = sm.end()
                continue
            lm = _LOCATE_START.match(s, i)
            j2 = lm.end()
            nxt = s[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/" and s.startswith("/>", j2):
                endpos = j2 + 2
            elif nxt == "":
                endpos = -1  # EOF inside tag
            elif nxt == "/" or nxt in (
                "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            ):
                endpos = -1
            else:
                endpos = j2 if j2 > i else i + 1
            if endpos >= 0:
                tm = _TAGFIND.match(s, i + 1)
                tag = tm.group(1).lower()
                kpos = tm.end()
                attrs: dict = {}
                while kpos < endpos:
                    am = _ATTRFIND.match(s, kpos)
                    if am is None:
                        break
                    aname, rest, aval = am.group(1, 2, 3)
                    if not rest:
                        aval = None
                    elif aval[:1] == "'" == aval[-1:] or aval[:1] == '"' == aval[-1:]:
                        aval = aval[1:-1]
                    if aval:
                        aval = _unescape(aval)
                    attrs[aname.lower()] = aval if aval is not None else ""
                    kpos = am.end()
                tail = s[kpos:endpos].strip()
                if tail == ">":
                    el = Element(tag, attrs)
                    b.stack[-1].append(el)
                    if tag not in VOID_ELEMENTS:
                        b.stack.append(el)
                    if tag in _RAW_TEXT_TAGS:
                        cdata_elem = tag
                elif tail == "/>":
                    b.stack[-1].append(Element(tag, attrs))
                else:
                    data(s[i:endpos])  # junk in tag: emitted raw (stdlib)
                k = endpos
        elif nc == "/":
            # ---- end tag (mirrors parse_endtag) ----
            gt = s.find(">", i + 1)
            if gt < 0:
                k = -1
            else:
                gtpos = gt + 1
                em = _ENDTAGFIND.match(s, i)
                if em is not None:
                    b.handle_endtag(em.group(1).lower())
                    k = em.end()
                else:
                    nm = _TAGFIND.match(s, i + 2)
                    if nm is None:
                        if s[i : i + 3] == "</>":
                            k = i + 3
                        else:  # bogus comment
                            b.handle_comment(s[i + 2 : gt])
                            k = gtpos
                    else:
                        g2 = s.find(">", nm.end())
                        b.handle_endtag(nm.group(1).lower())
                        k = g2 + 1  # stdlib quirk: g2 may be -1 -> k=0
                        if k <= i:
                            return  # stdlib would loop on stale rawdata
        elif s.startswith("<!--", i):
            m = _COMMENT_CLOSE.search(s, i + 4)
            if m is None:
                k = -1
            else:
                b.handle_comment(s[i + 4 : m.start()])
                k = m.end()
        elif s.startswith("<?", i):
            gt = s.find(">", i + 2)
            k = -1 if gt < 0 else gt + 1  # handle_pi is a no-op builder hook
        elif s.startswith("<!", i):
            if s[i : i + 9].lower() == "<!doctype":
                gt = s.find(">", i + 9)
                k = -1 if gt < 0 else gt + 1  # handle_decl unhooked
            else:  # bogus comment
                gt = s.find(">", i + 2)
                if gt < 0:
                    k = -1
                else:
                    b.handle_comment(s[i + 2 : gt])
                    k = gt + 1
        elif i + 1 < n:
            data("<")
            i += 1
            continue
        else:
            data("<")  # lone '<' at EOF: flushed as text by goahead(end=1)
            return
        if k < 0:
            # EOF recovery (goahead end=1): emit through next > or <
            k = s.find(">", i + 1)
            if k < 0:
                k = s.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            data(_unescape(s[i:k]))
        i = k


def parse_html(html: str) -> Element:
    """Parse an HTML string into a document Element (name='[document]').

    Fast one-shot tokenizer with stdlib-parser semantics; falls back to
    html.parser for marked sections ('<![') or on any tokenizer error.
    """
    if "<![" in html:
        return parse_html_stdlib(html)
    builder = _TreeBuilder()
    try:
        _fast_tokenize(html, builder)
    except Exception:
        return parse_html_stdlib(html)
    return builder.root


def ensure_body(doc: Element) -> Element:
    """Return the <body> element, synthesizing <html><body> wrappers for
    fragments, mirroring bs4(lxml)'s fragment promotion
    (chunking.py:265-268 relies on it)."""
    body = doc.find("body")
    if body is not None:
        return body
    html_el = doc.find("html")
    if html_el is None:
        html_el = Element("html")
        for node in list(doc.children):
            html_el.append(node)
        doc.append(html_el)
    head = html_el.find(lambda e: e.name == "head")
    if head is None:
        head = Element("head")
        html_el.append(head)
    body = Element("body")
    for node in list(html_el.children):
        if isinstance(node, Element) and node.name in ("head", "body"):
            continue
        # lxml promotes head-only content of fragments into <head>, so
        # e.g. a top-level <title> contributes no body text
        # (tests/responses/fragment2.html's chunk text depends on this)
        if isinstance(node, Element) and node.name in (
            "title", "meta", "link", "base", "style",
        ):
            head.append(node)
        else:
            body.append(node)
    html_el.append(body)
    return body


def stripped_strings(root: Element) -> list[str]:
    """Non-empty stripped text nodes in document order — bs4's
    soup.stripped_strings (the reference asserts this list verbatim on
    cleaned html_content, tests/test_goldie.py:64-86)."""
    out: list[str] = []

    def _walk(el: Element) -> None:
        for c in el.children:
            if isinstance(c, Text):
                s = c.data.strip()
                if s:
                    out.append(s)
            elif isinstance(c, Element):
                _walk(c)

    _walk(root)
    return out


def strip_comments(root: Element) -> None:
    """Remove all Comment nodes under root (goldie.py:56-59)."""
    def _strip(el: Element) -> None:
        el.children = [c for c in el.children if not isinstance(c, Comment)]
        for c in el.children:
            if isinstance(c, Element):
                _strip(c)

    _strip(root)
