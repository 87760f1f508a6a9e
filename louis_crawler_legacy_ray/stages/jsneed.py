"""JS-need heuristic (M12) — the SmartPlaywrightSpider routing
classifier (reference base_playwright.py:225-272): a page "needs
JavaScript rendering" when its main-content text is short (< 500
chars), or it contains loading-indicator strings, or JS-framework
markers. Produces a routing column; in the reference this chooses the
Playwright fetch path, here it is a map_batches classifier.

Defined so a DuckDB oracle reproduces it exactly: main-text length is
approximated by the (already extracted) text length — the oracle
operates on the same text column.
"""

from __future__ import annotations

import pyarrow as pa

MIN_TEXT_CHARS = 500  # base_playwright.py:242

LOADING_PATTERNS = (
    "loading...",
    "please wait",
    "javascript is required",
    "enable javascript",
    "<noscript>",
)

JS_FRAMEWORKS = (
    "data-reactroot",
    "ng-app",
    "v-app",
)


def js_need_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    texts = batch[text_col].to_pylist()
    short, loading, framework, needs = [], [], [], []
    for t in texts:
        low = (t or "").lower()
        s = len(low) < MIN_TEXT_CHARS
        lo = any(p in low for p in LOADING_PATTERNS)
        fw = any(f in low for f in JS_FRAMEWORKS)
        short.append(s)
        loading.append(lo)
        framework.append(fw)
        needs.append(s or lo or fw)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "minimal_content": pa.array(short, pa.bool_()),
            "loading_pattern": pa.array(loading, pa.bool_()),
            "js_framework": pa.array(framework, pa.bool_()),
            "needs_js": pa.array(needs, pa.bool_()),
        }
    )


def content_predicates_batch(
    batch: pa.Table, needles: tuple[str, ...], text_col: str = "text"
) -> pa.Table:
    """Corpus content predicates (reference A4: count_rdims_in_texts /
    count_pdf_links_in_texts): one boolean column per needle."""
    texts = [(t or "").lower() for t in batch[text_col].to_pylist()]
    cols = {"doc_id": batch["doc_id"].cast(pa.int64())}
    for needle in needles:
        key = "has_" + "".join(c if c.isalnum() else "_" for c in needle)
        cols[key] = pa.array([needle in t for t in texts], pa.bool_())
    return pa.table(cols)
