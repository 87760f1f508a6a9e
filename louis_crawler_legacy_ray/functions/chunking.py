"""Heading-aware 256-512-token chunker — from-scratch reimplementation
of the reference's hawn transform (louis/crawler/chunking.py, SURVEY
§2.9) over our stdlib mini-DOM:

1. parse + smooth; promote fragments to <html><body> (chunking.py:265-268);
2. heading-block grouping (chunking.py:158-196): body becomes the
   ``blocks h0-block`` root carrying the document title; lone-header
   wrappers (e.g. <summary><h1>) unwrapped; each h1..h6 wrapped with its
   following siblings up to the next same-or-higher heading into
   ``<div class="hN-block blocks" title=heading-text>``; ancestors
   marked ``parent``;
3. leaf segmentation (chunking.py:220-250): 256<=n<=512 emit as-is;
   n<256 greedily pack following sibling blocks <=512 then retry at the
   parent block, joining titles with ';' (chunking.py:120-156,198-218);
   n>512 split on '.' sentences into buckets targeting 409 tokens
   (chunking.py:79-118, constant at :100);
4. invariant: every combined chunk <=512 tokens (chunking.py:217).

Token caching in element attrs mirrors chunking.py:14-36 (attrs hold
native Python values here — same semantics, no stringify round-trip).
"""

from __future__ import annotations

import re

from .dom import Element, Text, ensure_body, parse_html
from .tokenizer import Encoder

HEADERS_RE = re.compile(r"^h[1-6]$")

_WS_RE = re.compile(r"\s+")

MIN_TOKENS = 256
MAX_TOKENS = 512
SPLIT_BUCKET_TOKENS = 409  # chunking.py:100


def smooth(el: Element) -> None:
    """Merge adjacent text-node children, recursively (soup.smooth(),
    chunking.py:267)."""
    merged: list = []
    for child in el.children:
        if isinstance(child, Text) and merged and isinstance(merged[-1], Text):
            merged[-1] = Text(merged[-1].data + child.data)
            merged[-1].parent = el
        else:
            merged.append(child)
    el.children = merged
    for child in el.children:
        if isinstance(child, Element):
            smooth(child)


def compute_tokens(block: Element, enc: Encoder) -> dict:
    """Tokenize a block's text, caching in attrs (chunking.py:14-36)."""
    if "tokens" in block.attrs:
        # cached values may be native (our own caching) or HTML-attr
        # strings (reference coerces with int()/json.loads,
        # chunking.py:16-20 — tests/responses/wrapped.html relies on it)
        import json as _json

        text_content = block.attrs["text_content"]
        token_count = block.attrs["token_count"]
        if isinstance(token_count, str):
            token_count = int(token_count)
        tokens = block.attrs["tokens"]
        if isinstance(tokens, str):
            tokens = _json.loads(tokens)
    else:
        text_content = _WS_RE.sub(" ", block.get_text()).strip()
        tokens = enc.encode(text_content)
        token_count = len(tokens)
        block.attrs["tokens"] = tokens
        block.attrs["token_count"] = token_count
        block.attrs["text_content"] = text_content
    title = block.attrs.get("title", "")
    return {
        "text_content": text_content,
        "tokens": list(tokens),
        "token_count": token_count,
        "title": title if isinstance(title, str) else "",
    }


def mark_parent(block: Element) -> None:
    """Flag a block and its ancestors as parents (chunking.py:38-55)."""
    if "parent" in block.attrs:
        return
    block.attrs["parent"] = True
    if block.name == "body":
        return
    if block.parent is not None:
        mark_parent(block.parent)


def mark_processed(block: Element) -> None:
    """(chunking.py:62-66)"""
    block.attrs["processed"] = True
    for child in block.find_all(lambda e: e.has_class("blocks")):
        child.attrs["processed"] = True


def group_heading_by_block(doc: Element) -> Element:
    """Wrap headings + trailing siblings into block divs
    (chunking.py:158-196). Returns the body element."""
    body = ensure_body(doc)
    cls = body.attrs.get("class", "")
    body.attrs["class"] = (cls + " blocks h0-block").strip() if isinstance(cls, str) else "blocks h0-block"
    title_el = doc.find("title")
    if title_el is not None:
        body.attrs["title"] = title_el.get_text().strip()

    # unwrap lone-header wrappers, e.g. <summary><h1>..</h1></summary>
    # (chunking.py:170-174); never unwrap structural roots
    for block in list(doc.find_all(lambda e: bool(HEADERS_RE.match(e.name)))):
        p = block.parent
        if (
            p is not None
            and p.name not in ("body", "html", "[document]")
            and not HEADERS_RE.match(p.name)
            and len(block.find_next_siblings()) == 0
        ):
            p.unwrap()

    for block in list(doc.find_all(lambda e: bool(HEADERS_RE.match(e.name)))):
        siblings = block.next_siblings_all()
        parent_div = block.wrap(
            Element(
                "div",
                {
                    "class": f"{block.name}-block blocks",
                    "title": block.get_text().strip(),
                },
            )
        )
        for sibling in siblings:
            if isinstance(sibling, Element) and HEADERS_RE.match(sibling.name or ""):
                if sibling.name[1] <= block.name[1]:
                    # same-or-higher heading level terminates the block
                    break
            parent_div.append(sibling)
        if parent_div.parent is not None:
            mark_parent(parent_div.parent)
    return body


def combine_chunks_into_single_chunk(chunks: list[dict]) -> dict:
    """(chunking.py:198-218) — mutates and returns chunks[0]; titles
    joined with ';' unless repeated; invariant total <= 512."""
    assert len(chunks) > 0
    if len(chunks) == 1:
        return chunks[0]
    chunk = chunks[0]
    for next_chunk in chunks[1:]:
        chunk["text_content"] += "\n" + next_chunk["text_content"]
        chunk["tokens"] += next_chunk["tokens"]
        chunk["token_count"] += next_chunk["token_count"]
        if next_chunk["title"] != chunk["title"]:
            chunk["title"] += ";" + next_chunk["title"]
        assert chunk["token_count"] <= MAX_TOKENS
    return chunk


def split_chunk_into_subchunks(large_chunk: dict, enc: Encoder) -> list[dict]:
    """Sentence-split an oversized leaf into ~409-token buckets
    (chunking.py:79-118)."""
    assert large_chunk["token_count"] > MAX_TOKENS
    sentences = large_chunk["text_content"].split(".")
    sentence_chunks = []
    for sentence in sentences:
        tokens = enc.encode(sentence)
        sentence_chunks.append(
            {
                "text_content": sentence,
                "tokens": tokens,
                "token_count": len(tokens),
                "title": large_chunk.get("title", ""),
            }
        )
    buckets: list[list[dict]] = [[]]
    bucket = buckets[0]
    bucket_size = 0
    for sc in sentence_chunks:
        if bucket_size + sc["token_count"] >= SPLIT_BUCKET_TOKENS:
            bucket = []
            buckets.append(bucket)
            bucket_size = 0
        bucket.append(sc)
        bucket_size += sc["token_count"]
    # guard vs the reference's latent empty-first-bucket crash when the
    # very first sentence alone exceeds the bucket target
    return [combine_chunks_into_single_chunk(b) for b in buckets if b]


def collect_chunks_from_block(
    block: Element, total_token_count: int, chunks: list[dict], enc: Encoder
) -> None:
    """Greedy sibling packing, escalating to the parent block
    (chunking.py:120-156)."""
    if "processed" not in block.attrs:
        chunk = compute_tokens(block, enc)
        prospective_total = total_token_count + chunk["token_count"]
        if prospective_total <= MAX_TOKENS:
            chunks.append(chunk)
            mark_processed(block)
        else:
            # too big: skip, let the next iteration handle it
            return
    else:
        prospective_total = total_token_count
    sibling = block.find_next_sibling_class("blocks")
    if sibling is not None:
        return collect_chunks_from_block(sibling, prospective_total, chunks, enc)
    parent_div = block.find_parent_class("blocks")
    if parent_div is not None:
        parent_chunks: list[dict] = []
        if "title" not in parent_div.attrs:
            parent_div.attrs["title"] = ";".join(c["title"] for c in chunks)
        collect_chunks_from_block(parent_div, 0, parent_chunks, enc)
        if parent_chunks:
            chunks.clear()
            chunks.extend(parent_chunks)
    return


def segment_blocks_into_chunks(blocks: list[Element], enc: Encoder) -> list[dict]:
    """(chunking.py:220-250)"""
    all_chunks: list[dict] = []
    for block in blocks:
        if "parent" in block.attrs:
            continue
        if "processed" in block.attrs:
            continue
        chunk = compute_tokens(block, enc)
        if chunk["token_count"] <= MAX_TOKENS:
            if chunk["token_count"] >= MIN_TOKENS:
                all_chunks.append(chunk)
                mark_processed(block)
            else:
                chunks: list[dict] = []
                collect_chunks_from_block(block, 0, chunks, enc)
                if chunks:
                    all_chunks.append(combine_chunks_into_single_chunk(chunks))
        else:
            all_chunks.extend(split_chunk_into_subchunks(chunk, enc))
            mark_processed(block)
    return all_chunks


def chunk_html(html: str, enc: Encoder | None = None) -> list[dict]:
    """Chunk an HTML document into 256-512-token chunks (chunking.py:
    252-276). Returns the chunk dicts (text_content, tokens,
    token_count, title)."""
    enc = enc or Encoder()
    doc = parse_html(html)
    smooth(doc)
    body = group_heading_by_block(doc)
    blocks = [body] if body.has_class("blocks") else []
    blocks += body.find_all(lambda e: e.has_class("blocks"))
    return segment_blocks_into_chunks(blocks, enc)
