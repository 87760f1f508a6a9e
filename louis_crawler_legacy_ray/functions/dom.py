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

The serializer is deterministic and canonical: ``<tag a="v">...</tag>``,
text emitted verbatim (input text is expected to be already-escaped
HTML), void elements self-contained. This is semantics-equivalent to the
reference's bs4(lxml) path, not byte-equivalent to lxml's private
formatting.
"""

from __future__ import annotations

from html.parser import HTMLParser

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

    def serialize(self, out: list[str]) -> None:
        out.append(self.data)

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

    def serialize(self, out: list[str]) -> None:
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
        attrs = "".join(
            f' {k}="{v}"' for k, v in self.attrs.items() if isinstance(v, str)
        )
        if self.name in VOID_ELEMENTS and not self.children:
            out.append(f"<{self.name}{attrs}/>")
            return
        out.append(f"<{self.name}{attrs}>")
        for child in self.children:
            if skip_comments and isinstance(child, Comment):
                continue
            if isinstance(child, Element):
                child.serialize(out, skip_comments)
            else:
                child.serialize(out)
        out.append(f"</{self.name}>")

    def to_html(self, skip_comments: bool = False) -> str:
        out: list[str] = []
        self.serialize(out, skip_comments)
        return "".join(out)

    def inner_html(self) -> str:
        out: list[str] = []
        for child in self.children:
            child.serialize(out)
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


def parse_html(html: str) -> Element:
    """Parse an HTML string into a document Element (name='[document]')."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
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
    body = Element("body")
    for node in list(html_el.children):
        if isinstance(node, Element) and node.name in ("head", "body"):
            continue
        body.append(node)
    html_el.append(body)
    return body


def strip_comments(root: Element) -> None:
    """Remove all Comment nodes under root (goldie.py:56-59)."""
    def _strip(el: Element) -> None:
        el.children = [c for c in el.children if not isinstance(c, Comment)]
        for c in el.children:
            if isinstance(c, Element):
                _strip(c)

    _strip(root)
