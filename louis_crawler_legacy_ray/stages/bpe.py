"""Distributed BPE tokenizer training + actor-pool encoding.

The reference chunks with a PRETRAINED tokenizer (tiktoken cl100k,
louis/crawler/chunking.py:10) and ships no trainer; a 100 TB curation
engine needs to LEARN the vocabulary from its own corpus (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"). The split of labor follows the classic algorithm's structure:

- **Corpus -> word-frequency table is the distributed part** (and the
  only part that touches corpus-sized data): per-block ``Counter``
  partials -> ONE ``groupby(word).sum`` -> optional top-``max_words``
  cap (per-block top-k combiner, then an output-sized sort) — the same
  combiner-pruned shuffle shape as ``vocab_stats``.
- **The merge loop runs on the driver over the DISTINCT-WORD table**
  (BPE is a function of word frequencies, not of the corpus stream).
  Its input is bounded by ``max_words`` rows — at 100 TB you cap to
  the top ~1M types and rare tails fall back to character pieces,
  which is exactly what production trainers do. Incremental pair-count
  maintenance (pair -> affected-word index) keeps the loop
  O(merges x touched words), not O(merges x vocab).
- **Encoding is an actor-pool ``map_batches`` stage**: merge ranks are
  built once per actor in ``__init__`` from a plasma ref, and a
  per-word encode cache makes batch cost proportional to DISTINCT
  words per block. Emits a ``round_trip_ok`` self-check column
  (decode(encode(w)) == w) so the driver's rows-only gate carries a
  pass/fail signal.

Determinism: merge selection tie-breaks by (count DESC, pair ASC), so
the learned merges are a pure function of the word-frequency table —
block layout and actor scheduling cannot change them (pytest pins
this; an iterative argmax is not SQL-expressible, hence no DuckDB
oracle for the merge table itself).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

_WORD_RE = re.compile(r"[a-z0-9]+")

END = "</w>"


def word_freqs(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, cnt) over the corpus — per-block Counter partials, one
    groupby over distinct words."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def top_words(
    wf: ray.data.Dataset, max_words: int
) -> ray.data.Dataset:
    """Cap the type table to the ``max_words`` most frequent words
    (tie-break: word ASC) — per-block top-k combiner first so the sort
    ranks at most k rows per block."""
    import pyarrow.compute as pc

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= max_words:
            return b
        order = pc.sort_indices(
            b, sort_keys=[("cnt", "descending"), ("word", "ascending")]
        )
        return b.take(order[:max_words])

    return (
        wf.map_batches(local_topk, batch_format="pyarrow")
        .sort(["cnt", "word"], descending=[True, False])
        .limit(max_words)
    )


def bpe_merges_from_freqs(
    freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency dict.

    Incremental bookkeeping: ``pair_counts`` plus a pair -> {word_idx}
    index; a merge rescans only the words that contain the pair.
    Deterministic: best pair = max count, ties -> lexicographically
    smallest (a, b). Stops early when no pair occurs twice."""
    words: list[list[str]] = []
    wfreq: list[int] = []
    for w, f in freqs.items():
        if not w:
            continue
        words.append(list(w) + [END])
        wfreq.append(int(f))

    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for i, syms in enumerate(words):
        f = wfreq[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            where[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_cnt = 1  # a pair must occur at least twice to merge
        for p, c in pair_counts.items():
            if c > best_cnt or (c == best_cnt and best is not None and p < best):
                best, best_cnt = p, c
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in sorted(where[best]):
            syms = words[i]
            f = wfreq[i]
            # remove old pair contributions for this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                where[(a, b)].discard(i)
            # apply the merge left-to-right
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # add back new pair contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                where[(a, b)].add(i)
    return merges


def train_bpe(
    docs: ray.data.Dataset,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver merge loop; the driver holds
    at most ``max_words`` (or the corpus's distinct-type count) rows."""
    wf = word_freqs(docs, text_col)
    if max_words is not None:
        wf = top_words(wf, max_words)
    freqs = {r["word"]: int(r["cnt"]) for r in wf.iter_rows()}
    return bpe_merges_from_freqs(freqs, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE application (the standard apply
    rule: repeatedly merge the best-ranked adjacent pair present)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encode stage: ranks built once per actor from the
    broadcast merge list; per-word cache so block cost is proportional
    to distinct words. Output per doc: token/word counts, distinct
    piece types, and the round-trip self-check."""

    def __init__(self, merges_ref, text_col: str = "text"):
        merges = ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, list[str]] = {}

    def _encode(self, w: str) -> list[str]:
        toks = self.cache.get(w)
        if toks is None:
            toks = encode_word(w, self.ranks)
            self.cache[w] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_words, n_tokens, n_types, rt = [], [], [], [], []
        for doc_id, t in zip(
            batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()
        ):
            ws = _WORD_RE.findall((t or "").lower())
            if not ws:
                continue
            total = 0
            types: set[str] = set()
            ok = True
            for w in ws:
                toks = self._encode(w)
                total += len(toks)
                types.update(toks)
                if "".join(toks).removesuffix(END) != w:
                    ok = False
            ids.append(doc_id)
            n_words.append(len(ws))
            n_tokens.append(total)
            n_types.append(len(types))
            rt.append(ok)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_piece_types": pa.array(n_types, pa.int64()),
                "round_trip_ok": pa.array(rt, pa.bool_()),
            }
        )


def bpe_encode(
    docs: ray.data.Dataset,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int | None = None,
) -> ray.data.Dataset:
    """Train on the corpus, broadcast the merges once, encode every
    document through the actor pool."""
    merges = train_bpe(docs, n_merges, text_col, max_words)
    ref = ray.put(merges)
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(ref, text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


class BpeTokenEncoder:
    """Drop-in for the chunker's tokenizer seam (the duck-typed
    ``encode(text) -> list[int]`` / ``count(text) -> int`` contract of
    functions/tokenizer.py — the reference swaps tokenizers at exactly
    this seam, louis/crawler/chunking.py:10): a CORPUS-TRAINED BPE
    instead of the hash stand-in. Word runs ([a-z0-9]+, lowercased)
    encode through the learned merges; every other non-space mark is
    its own token (the repo's standard token model). Ids are stable
    31-bit hashes of the piece strings — processes and runs agree
    without a shared vocab file, and the chunker's semantics never
    depend on concrete id values."""

    def __init__(self, merges: list[tuple[str, str]]):
        import hashlib as _hl

        self.name = f"corpus-trained BPE ({len(merges)} merges)"
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._word_cache: dict[str, list[int]] = {}
        self._hl = _hl

    def _piece_id(self, piece: str) -> int:
        return (
            int.from_bytes(
                self._hl.blake2b(piece.encode(), digest_size=4).digest(), "big"
            )
            & 0x7FFFFFFF
        )

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for m in _TOKEN_RE.finditer(text.lower()):
            tok = m.group()
            if tok[0].isalnum():
                ids = self._word_cache.get(tok)
                if ids is None:
                    ids = [
                        self._piece_id(p) for p in encode_word(tok, self.ranks)
                    ]
                    self._word_cache[tok] = ids
                out.extend(ids)
            else:
                out.append(self._piece_id(tok))
        return out

    def count(self, text: str) -> int:
        return len(self.encode(text))


_TOKEN_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")
