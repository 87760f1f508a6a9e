"""louis_crawler_legacy_ray — a Ray-Data-native crawl & extract engine.

A from-scratch reimplementation of the data-processing capabilities of
``ai-cfia/louis-crawler-legacy`` (reference at /root/reference, read-only)
on Ray Data: a URL-frontier + fetch scheduler (sharded URL-seen filter,
per-host politeness, depth-synchronous BFS) driving streaming
``ray.data.Dataset`` pipelines of zero-copy Arrow ``map_batches`` stages
(HTML clean/extract, heading-aware 256-512-token chunking, embedding),
plus the large-scale training-data operators (dedup family, ANN,
text analysis) the 100 TB design point needs.

Layout:
  functions/  pure kernels (no Ray): urls, dom, html cleaning, tokenizer,
              chunking, text stats, hashing
  sources/    synthetic pages builder + parquet IO helpers
  stages/     Ray Data stages (map_batches fns / actor classes)
  state/      sharded seen-filter + politeness actors, checkpointing
  pipelines/  end-to-end pipelines (crawl frontier, ingest, queries)

Environment note: bs4/lxml/tiktoken are NOT available in this container;
HTML parsing is stdlib ``html.parser`` and tokenization is a
deterministic regex/byte-hash stand-in for cl100k_base. Semantics
(noise-selector drops, comment stripping, whitespace collapse, 256/512
chunk bounds, 409 split buckets, ';' title joins) follow the reference
exactly; byte layout of serialized HTML necessarily differs from
bs4+lxml where those libraries make private formatting choices.
"""

__version__ = "0.1.0"
