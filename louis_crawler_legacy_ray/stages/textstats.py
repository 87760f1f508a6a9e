"""Text-analysis stages over a documents table: token counting, quality
scoring, n-gram-heuristic language ID, document fingerprinting.

These are the large-scale-training-pipeline operators the task brief
adds beyond the reference's own inventory. Every kernel here is defined
so an ANSI-SQL oracle can compute the identical value in DuckDB (same
regex class semantics in RE2 and Python ``re``, same float division
order), making them first-class entries in the driver's correctness
gate.

All stages are stateless ``map_batches`` transforms; the regexes are
module-level compiled constants (compiled once per worker process at
import — no per-batch setup).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token model: alnum runs, or single non-alnum-non-space marks.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[A-Za-z0-9]+"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"
STOP_PATTERN = r"\b(?:the|a|and|of|to|in|is|it|that|for)\b"

# language-ID stopword classes (priority order en > fr > es > de on ties)
LANG_PATTERNS = {
    "en": r"\b(?:the|and|of|to|in|is)\b",
    "fr": r"\b(?:le|la|les|et|une|est|dans)\b",
    "es": r"\b(?:el|los|las|y|una|es|en)\b",
    "de": r"\b(?:der|die|das|und|ist|ein)\b",
}

_TOKEN_RE = re.compile(TOKEN_PATTERN)
_WORD_RE = re.compile(WORD_PATTERN)
_PUNCT_RE = re.compile(PUNCT_PATTERN)
_STOP_RE = re.compile(STOP_PATTERN)
_LANG_RES = {k: re.compile(v) for k, v in LANG_PATTERNS.items()}
_WS_RE = re.compile(r"\s+")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, token_count, word_count) — whitespace+punct token model
    (the 'BPE-ish regex' counter of the task brief)."""
    texts = batch[text_col].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(
                [len(_TOKEN_RE.findall(t or "")) for t in texts], pa.int64()
            ),
            "word_count": pa.array(
                [len(_WORD_RE.findall(t or "")) for t in texts], pa.int64()
            ),
        }
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features: lengths, punctuation/stopword ratios, and a
    keep flag (simple filters in the C4/Gopher tradition)."""
    texts = batch[text_col].to_pylist()
    n_chars, n_words, n_punct, n_stop = [], [], [], []
    for t in texts:
        t = t or ""
        n_chars.append(len(t))
        n_words.append(len(_WORD_RE.findall(t)))
        n_punct.append(len(_PUNCT_RE.findall(t)))
        n_stop.append(len(_STOP_RE.findall(t.lower())))
    punct_ratio = [
        (p / c) if c > 0 else 0.0 for p, c in zip(n_punct, n_chars)
    ]
    stop_ratio = [s / max(w, 1) for s, w in zip(n_stop, n_words)]
    keep = [
        (w >= 10 and sr >= 0.01) for w, sr in zip(n_words, stop_ratio)
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def lang_scores(text: str) -> dict[str, int]:
    low = (text or "").lower()
    return {k: len(rx.findall(low)) for k, rx in _LANG_RES.items()}


def predict_lang(scores: dict[str, int]) -> str:
    if all(v == 0 for v in scores.values()):
        return "und"
    # deterministic priority on ties: en > fr > es > de
    for k in ("en", "fr", "es", "de"):
        if scores[k] == max(scores.values()):
            return k
    return "und"


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    all_scores = [lang_scores(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "score_en": pa.array([s["en"] for s in all_scores], pa.int64()),
            "score_fr": pa.array([s["fr"] for s in all_scores], pa.int64()),
            "score_es": pa.array([s["es"] for s in all_scores], pa.int64()),
            "score_de": pa.array([s["de"] for s in all_scores], pa.int64()),
            "predicted_lang": pa.array(
                [predict_lang(s) for s in all_scores], pa.string()
            ),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 of the whitespace-normalized text
    (stable, SQL-expressible: md5(trim(regexp_replace(...))))."""
    texts = batch[text_col].to_pylist()
    fps = [
        hashlib.md5(_WS_RE.sub(" ", (t or "")).strip().encode()).hexdigest()
        for t in texts
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


_ROLL_BASE = 1_000_003
_ROLL_MOD = (1 << 61) - 1


def rolling_hash(text: str) -> int:
    """Polynomial rolling hash over bytes mod 2^61-1 (not SQL-
    expressible; covered by the rows-only check + unit tests)."""
    h = 0
    for b in (text or "").encode("utf-8"):
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
    return h


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "rolling_fp": pa.array([rolling_hash(t) for t in texts], pa.int64()),
        }
    )


# codepoint-companion rolling fingerprint (VERDICT r3 #5): same Horner
# recurrence as rolling_hash but over the first 256 CODEPOINTS with
# small constants, so DuckDB evaluates it exactly —
# list_reduce(unicode(chars), (h,b) -> (h*131+b) % (2^31-1)) — and the
# rows-only byte-level fingerprint gains an exact-oracle twin.
ROLL_CP_BASE = 131
ROLL_CP_MOD = (1 << 31) - 1
ROLL_CP_LIMIT = 256

_ROLL_CP_POWS = None


def rolling_hash_cp(text: str) -> int:
    """h = sum(cp_i * BASE^(L-1-i)) mod (2^31-1) over the first 256
    codepoints — vectorized Horner (products < 2^52, sums < 2^60: all
    exact in int64)."""
    global _ROLL_CP_POWS
    if _ROLL_CP_POWS is None:
        p = np.empty(ROLL_CP_LIMIT, dtype=np.int64)
        acc = 1
        for j in range(ROLL_CP_LIMIT):
            p[j] = acc
            acc = (acc * ROLL_CP_BASE) % ROLL_CP_MOD
        _ROLL_CP_POWS = p
    t = (text or "")[:ROLL_CP_LIMIT]
    if not t:
        return 0
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return int((cps * _ROLL_CP_POWS[len(cps) - 1 :: -1]).sum() % ROLL_CP_MOD)


def rolling_fp_cp_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "rolling_fp_cp": pa.array(
                [rolling_hash_cp(t) for t in texts], pa.int64()
            ),
        }
    )


# line-level C4-style cleaning (Raffel et al. 2020 §2.2 heuristics,
# simplified to the SQL-expressible core): a line survives iff it ends
# in terminal punctuation and carries at least 3 words. Both sides of
# the oracle use the same RE2/`re`-compatible patterns.
C4_LINE_END_PATTERN = r'[.!?"]\s*$'
C4_MIN_LINE_WORDS = 3

_C4_END_RE = re.compile(C4_LINE_END_PATTERN)


def c4_line_filter_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4-style line filtering: keep lines ending in terminal
    punctuation with >= 3 words; emit the cleaned text plus line
    accounting. Stateless map_batches stage — at 100 TB this runs
    embarrassingly parallel with no shuffle."""
    texts = batch[text_col].to_pylist()
    n_lines: list[int] = []
    n_kept: list[int] = []
    cleaned: list[str] = []
    for t in texts:
        lines = (t or "").split("\n")
        kept = [
            ln
            for ln in lines
            if _C4_END_RE.search(ln)
            and len(_WORD_RE.findall(ln)) >= C4_MIN_LINE_WORDS
        ]
        n_lines.append(len(lines))
        n_kept.append(len(kept))
        cleaned.append("\n".join(kept))
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "clean_text": pa.array(cleaned, pa.string()),
            "keep": pa.array([k > 0 for k in n_kept], pa.bool_()),
        }
    )


_VOCAB_RE = re.compile(r"[a-z0-9]+")


def vocab_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Partial (combiner) vocabulary counts for one batch: term ->
    (total tf, docs containing). Emitting pre-aggregated partials is
    the scale shape — the downstream groupby('term') shuffle carries
    one row per distinct term per block instead of one per token."""
    from collections import Counter

    tf: Counter = Counter()
    df: Counter = Counter()
    for t in batch[text_col].to_pylist():
        terms = _VOCAB_RE.findall((t or "").lower())
        tf.update(terms)
        df.update(set(terms))
    keys = list(tf.keys())
    return pa.table(
        {
            "term": pa.array(keys, pa.string()),
            "total_tf": pa.array([tf[k] for k in keys], pa.int64()),
            "df": pa.array([df[k] for k in keys], pa.int64()),
        }
    )


def tfidf_topk(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, rank, term): each document's top-k terms by
    tf * ln(N/df), ties (score desc, term asc) — the classic salient-
    term extractor of curation/indexing pipelines.

    Scale shape: document frequency comes from the same pre-aggregated
    per-block partials as vocab_stats (the shuffle carries one row per
    distinct term per block), and the resulting idf table — vocabulary-
    sized, millions of rows at web scale, not corpus-sized — is
    broadcast once via ray.put; the scoring pass is then a single
    stateless map over the corpus. The per-doc top-k never leaves the
    worker.
    """
    import math

    import ray
    from ray.data.aggregate import Sum

    n_docs = ds.count()
    df_tbl = (
        ds.map_batches(vocab_partial_batch, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    idf = {
        r["term"]: math.log(n_docs / r["df"])
        for b in df_tbl.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    idf_ref = ray.put(idf)

    def topk(batch: pa.Table) -> pa.Table:
        from collections import Counter

        idf_map = ray.get(idf_ref)
        out_id, out_rank, out_term = [], [], []
        ids = batch[id_col].to_pylist()
        for i, t in zip(ids, batch[text_col].to_pylist()):
            tf = Counter(_VOCAB_RE.findall((t or "").lower()))
            scored = sorted(
                ((term, cnt * idf_map[term]) for term, cnt in tf.items()),
                key=lambda ts_: (-ts_[1], ts_[0]),
            )[:k]
            for rank, (term, _score) in enumerate(scored, 1):
                out_id.append(i)
                out_rank.append(rank)
                out_term.append(term)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "term": pa.array(out_term, pa.string()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow")


# ---------------------------------------------------------------- PII scrub
# Vectorized PII redaction: pyarrow.compute.replace_substring_regex is
# RE2, DuckDB's regexp_replace(..., 'g') is RE2 — identical dialect, so
# the oracle is exact. Email first, then digit runs (order matters for
# digits inside addresses); both sides apply the same order.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
NUM_PATTERN = r"[0-9]+"


def pii_redact_batch(
    batch: pa.Table, text_col: str = "props", id_col: str = "event_id"
) -> pa.Table:
    """Scrub emails and digit runs from a text column (zero-copy in,
    two RE2 kernel passes, no Python per-row loop)."""
    import pyarrow.compute as _pc

    s = batch[text_col].cast(pa.string())
    s = _pc.replace_substring_regex(s, EMAIL_PATTERN, "<EMAIL>")
    s = _pc.replace_substring_regex(s, NUM_PATTERN, "<NUM>")
    return pa.table(
        {id_col: batch[id_col].cast(pa.int64()), "props_clean": s}
    )


# ------------------------------------------------------- repetition filter
# Gopher-style (Rae et al. 2021, Table A1) repetition signal, reduced
# to the SQL-expressible core: the duplicate-word fraction
# 1 - distinct_words/word_count. One IEEE division + one subtraction of
# exact integers — bit-identical between numpy/Python and DuckDB.
REPETITION_TAU = 0.5


def repetition_batch(
    batch: pa.Table, text_col: str = "text", tau: float = REPETITION_TAU
) -> pa.Table:
    texts = batch[text_col].to_pylist()
    n_words: list[int] = []
    n_distinct: list[int] = []
    fracs: list[float] = []
    for t in texts:
        ws = _WORD_RE.findall(t or "")
        n = len(ws)
        d = len(set(ws))
        n_words.append(n)
        n_distinct.append(d)
        fracs.append(0.0 if n == 0 else 1.0 - d / n)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "word_count": pa.array(n_words, pa.int64()),
            "distinct_words": pa.array(n_distinct, pa.int64()),
            "dup_frac": pa.array(fracs, pa.float64()),
            "keep": pa.array([f <= tau for f in fracs], pa.bool_()),
        }
    )


def inverted_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch inverted-index partials: one row per distinct
    (term, doc) pair with its in-document term frequency. The
    downstream groupby('term') merges partials into postings — the
    shuffle carries term-doc pairs (corpus-vocabulary bounded), never
    per-token rows. At 10^10-doc scale the postings for a term no
    longer fit one group; the documented shape is term-hash-sharded
    postings files with per-shard doc-id delta encoding — the same
    groupby with ('term', hash(doc_id) % S) as the key."""
    from collections import Counter

    terms_out: list[str] = []
    docs_out: list[int] = []
    tfs_out: list[int] = []
    doc_ids = batch["doc_id"].to_pylist()
    for doc_id, t in zip(doc_ids, batch[text_col].to_pylist()):
        c = Counter(_VOCAB_RE.findall((t or "").lower()))
        for term, tf in c.items():
            terms_out.append(term)
            docs_out.append(doc_id)
            tfs_out.append(tf)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


def postings_group(df):
    """map_groups reducer: one term's (doc_id, tf) rows -> a postings
    row (df, total_tf, comma-joined doc ids sorted ascending)."""
    import pandas as pd

    from . import from_pandas_clean

    docs = sorted(int(d) for d in df["doc_id"])
    return from_pandas_clean(
        pd.DataFrame(
            {
                "term": [df["term"].iloc[0]],
                "df": [len(docs)],
                "total_tf": [int(df["tf"].sum())],
                "postings": [",".join(str(d) for d in docs)],
            }
        )
    )


def unigram_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch word-count partials (word, cnt) with the SAME
    tokenization as the bigram partials — the marginals for
    association scores (lift / PMI)."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch[text_col].to_pylist():
        c.update(_VOCAB_RE.findall((t or "").lower()))
    return pa.table(
        {
            "word": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        }
    )


def bigram_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch adjacent-word co-occurrence partials (w1, w2, cnt).
    Pre-aggregating inside the batch keeps the two-key groupby shuffle
    at one row per distinct bigram per block."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch[text_col].to_pylist():
        ws = _VOCAB_RE.findall((t or "").lower())
        c.update(zip(ws, ws[1:]))
    keys = list(c.keys())
    return pa.table(
        {
            "w1": pa.array([k[0] for k in keys], pa.string()),
            "w2": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def split_assign_batch(batch: pa.Table, val_pct: int = 5) -> pa.Table:
    """Deterministic train/val split partials: split membership is a
    pure function of the doc id (first 8 hex chars of md5 as uint32,
    mod 100 < val_pct -> 'val'), so any node — and an ANSI-SQL oracle —
    assigns identically with no coordination; per-batch count/word
    partials keep the final groupby at two rows per block."""
    n_train = n_val = 0
    w_train = w_val = 0
    for doc_id, t in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        w = len(_WORD_RE.findall(t or ""))
        if h % 100 < val_pct:
            n_val += 1
            w_val += w
        else:
            n_train += 1
            w_train += w
    return pa.table(
        {
            "split": pa.array(["train", "val"], pa.string()),
            "n_docs": pa.array([n_train, n_val], pa.int64()),
            "total_words": pa.array([w_train, w_val], pa.int64()),
        }
    )


def inverted_shard_partial_batch(
    batch: pa.Table, n_shards: int = 4, text_col: str = "text"
) -> pa.Table:
    """Sharded-postings partials: like inverted_partial_batch plus the
    posting shard ``pshard = md5(doc_id) % n_shards``. This is the
    documented scale path made real: when a hot term's postings
    outgrow one group, the group key becomes (term, pshard) so each
    shard's postings build in parallel and no single reducer holds a
    10^10-doc posting list. The shard id is a pure function of the
    doc id (md5 hex, like the train/val split), so the SQL oracle
    computes it identically."""
    from collections import Counter

    terms_out: list[str] = []
    shards_out: list[int] = []
    docs_out: list[int] = []
    tfs_out: list[int] = []
    for doc_id, t in zip(
        batch["doc_id"].to_pylist(), batch[text_col].to_pylist()
    ):
        ps = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            % n_shards
        )
        c = Counter(_VOCAB_RE.findall((t or "").lower()))
        for term, tf in c.items():
            terms_out.append(term)
            shards_out.append(ps)
            docs_out.append(doc_id)
            tfs_out.append(tf)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "pshard": pa.array(shards_out, pa.int64()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


def sharded_postings_group(df):
    """map_groups reducer over (term, pshard): one posting SHARD."""
    import pandas as pd

    from . import from_pandas_clean

    docs = sorted(int(d) for d in df["doc_id"])
    return from_pandas_clean(
        pd.DataFrame(
            {
                "term": [df["term"].iloc[0]],
                "pshard": [int(df["pshard"].iloc[0])],
                "df": [len(docs)],
                "total_tf": [int(df["tf"].sum())],
                "postings": [",".join(str(d) for d in docs)],
            }
        )
    )


# LM fold caps (count pruning, the KenLM `--prune` discipline): the
# driver folds at most MAX_LM_VOCAB unigram types and MAX_LM_BIGRAMS
# bigram types — pruned events fall through to the +1/(cu+V) smoothing
# floor. Gate-scale vocabularies sit far under both caps, so the
# DuckDB oracle is unaffected; at 100 TB the caps bound the driver
# fold where the uncapped dicts would be corpus-sized.
MAX_LM_VOCAB = 1_000_000
MAX_LM_BIGRAMS = 4_000_000


def train_bigram_lm(
    train_ds: "ray.data.Dataset",
    text_col: str = "text",
    max_vocab: int | None = MAX_LM_VOCAB,
    max_bigrams: int | None = MAX_LM_BIGRAMS,
):
    """CCNet-style LM training side (Wenzek et al. 2020 train a KenLM
    per language and bucket the corpus by perplexity; the reference has
    no LM stage — this extends its inventory per the task brief). Here
    the model is an add-one-smoothed bigram LM with the repo's standard
    tokenization: counts aggregated distributively (per-batch Counter
    partials -> one groupby), then broadcast ONCE via ray.put exactly
    like decontaminate's benchmark n-grams — every scoring task reads
    the same plasma object, nothing is re-shipped per batch.

    Returns (bigram_ref, context_ref, vocab_size). The driver-side
    fold is BOUNDED: when the distributed type counts exceed
    ``max_vocab`` / ``max_bigrams``, a distributed sort-by-count +
    limit keeps only the top-K heavy hitters (ties broken
    lexicographically for determinism) before anything reaches the
    driver — standard LM count pruning; pruned events score at the
    +1/(cu+V) smoothing floor. V stays the UNPRUNED unigram type
    count so the smoothing denominator is scale-invariant. Pass
    ``None`` to uncap (oracle-exact for dimension-sized test vocabs,
    which sit far under the default caps anyway).
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    bi = (
        train_ds.map_batches(
            lambda b: bigram_partial_batch(b, text_col), batch_format="pyarrow"
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="c"))
        .materialize()
    )
    uni = (
        train_ds.map_batches(
            lambda b: unigram_partial_batch(b, text_col), batch_format="pyarrow"
        )
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="c"))
        .materialize()
    )
    n_vocab = uni.count()
    if max_vocab is not None and n_vocab > max_vocab:
        uni = uni.sort(
            ["c", "word"], descending=[True, False]
        ).limit(max_vocab)
    if max_bigrams is not None and bi.count() > max_bigrams:
        bi = bi.sort(
            ["c", "w1", "w2"], descending=[True, False, False]
        ).limit(max_bigrams)
    cb = {(r["w1"], r["w2"]): int(r["c"]) for r in bi.iter_rows()}
    cu = {r["word"]: int(r["c"]) for r in uni.iter_rows()}
    return _ray.put(cb), _ray.put(cu), n_vocab


class PerplexityScorer:
    """Actor-pool scoring stage: nll_c = round(-avg_i ln p(w_i|w_{i-1})
    * 10000) (integer tenth-milli-nats; every per-token term is ln of a
    rational of the SAME integers in any engine, so only the summation
    order is engine-dependent — 1e-13 accumulation vs a 5e-5 rounding
    boundary). Docs under two tokens are dropped (no bigram events).
    The model dicts are fetched from plasma once per actor."""

    def __init__(self, cb_ref, cu_ref, vocab_size: int, text_col: str = "text"):
        import ray as _ray

        self.cb = _ray.get(cb_ref)
        self.cu = _ray.get(cu_ref)
        self.v = vocab_size
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        ids, nlls = [], []
        for doc_id, t in zip(
            batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()
        ):
            ws = _VOCAB_RE.findall((t or "").lower())
            if len(ws) < 2:
                continue
            s = 0.0
            for w1, w2 in zip(ws, ws[1:]):
                s += math.log(
                    (self.cb.get((w1, w2), 0) + 1.0)
                    / (self.cu.get(w1, 0) + self.v)
                )
            ids.append(doc_id)
            nlls.append(round(-s / (len(ws) - 1) * 10000))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "nll_c": pa.array(nlls, pa.int64()),
            }
        )


def ntile_of_rank(rank: int, n: int, tiles: int) -> int:
    """SQL NTILE(tiles) bucket for 1-based ``rank`` of ``n`` rows:
    the first n % tiles buckets get one extra row."""
    q, rem = divmod(n, tiles)
    big = (q + 1) * rem
    if rank <= big:
        return (rank - 1) // (q + 1) + 1
    return rem + (rank - 1 - big) // q + 1


# ------------------------------------------------------- Gopher rules
_G_WS_WORD_RE = re.compile(r"\S+")
_G_SYM_RE = re.compile(r"#|\.\.\.|…")
_G_BULLET_RE = re.compile(r"^[ \t]*[-*•]", re.MULTILINE)
_G_ELLIPSIS_RE = re.compile(r"(\.\.\.|…)$", re.MULTILINE)
_G_ALPHA_WORD_RE = re.compile(r"\S*[A-Za-z]\S*")
_G_STOP_RE = re.compile(r"\b(the|be|to|of|and|that|have|with)\b")


def gopher_quality_batch(
    batch: pa.Table, text_col: str = "text", min_words: int = 50
) -> pa.Table:
    """Gopher quality heuristics (Rae et al. 2021, A1.1) as EXACT
    integer features + keep flag — every condition is an integer
    cross-multiplication (10*n_sym < n_words instead of ratio < 0.1),
    so the DuckDB oracle hash-matches bit-for-bit:

      * word count in [min_words, 100000] (whitespace words)
      * mean word length in [3, 10]
      * symbol-to-word ratio ('#'/'...'/ellipsis) < 0.1
      * < 90% of lines start with a bullet
      * < 30% of lines end with an ellipsis
      * >= 80% of words contain an alphabetic character
      * >= 2 distinct required stop words
    """
    ids = batch["doc_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    cols: dict[str, list] = {
        k: []
        for k in (
            "n_words n_word_chars n_sym n_lines n_bullet n_ellipsis "
            "n_alpha_words n_stop_distinct keep".split()
        )
    }
    for t in texts:
        t = t or ""
        words = _G_WS_WORD_RE.findall(t)
        nw = len(words)
        nchars = sum(len(w) for w in words)
        nsym = len(_G_SYM_RE.findall(t))
        nlines = t.count("\n") + 1
        nbul = len(_G_BULLET_RE.findall(t))
        nell = len(_G_ELLIPSIS_RE.findall(t))
        nalpha = len(_G_ALPHA_WORD_RE.findall(t))
        nstop = len(set(_G_STOP_RE.findall(t.lower())))
        keep = (
            min_words <= nw <= 100_000
            and 3 * nw <= nchars <= 10 * nw
            and 10 * nsym < nw
            and 10 * nbul < 9 * nlines
            and 10 * nell < 3 * nlines
            and 10 * nalpha >= 8 * nw
            and nstop >= 2
        )
        for k, v in zip(cols, (nw, nchars, nsym, nlines, nbul, nell, nalpha, nstop, keep)):
            cols[k].append(v)
    out: dict[str, pa.Array] = {"doc_id": pa.array(ids, pa.int64())}
    for k, v in cols.items():
        out[k] = pa.array(v, pa.bool_() if k == "keep" else pa.int64())
    return pa.table(out)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    ds,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(rank, doc_id): global top-k documents for a term query under
    Lucene-variant BM25 — ``score(d) = sum_t ln((N - df_t + 0.5)/(df_t
    + 0.5) + 1) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    k1=1.2, b=0.75 — the ranked-retrieval companion to inverted_index
    (which returns postings, not an ordering).

    Float discipline (see queries.py): scores are used for ORDERING
    only, never emitted; per-document terms are summed in SORTED term
    order with the exact operand parenthesization the SQL oracle
    mirrors, and ties break by doc_id, so the (rank, doc_id) output is
    integer-stable.

    Scale shape: one combiner pass folds query-term document
    frequencies and the corpus token total (rows per block = |query|+1,
    so the stats shuffle is tiny); the scoring pass is one stateless
    map over the corpus carrying the (tiny) query stats in its closure;
    each block emits only its LOCAL top-k, and one single-partition
    fold ranks the k*blocks survivors — no corpus-sized sort.
    """
    import math

    from ray.data.aggregate import Sum

    q = sorted(set(query_terms))
    qset = set(q)
    n_docs = ds.count()

    def stats_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        df: Counter = Counter()
        tokens = 0
        for t in batch[text_col].to_pylist():
            terms = _VOCAB_RE.findall((t or "").lower())
            tokens += len(terms)
            for w in qset.intersection(terms):
                df[w] += 1
        keys = sorted(df)
        return pa.table(
            {
                "term": pa.array(keys + [""], pa.string()),
                "n": pa.array([df[w] for w in keys] + [tokens], pa.int64()),
            }
        )

    stats = {
        r["term"]: r["n"]
        for b in (
            ds.map_batches(stats_partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n", alias_name="n"))
            .iter_batches(batch_format="pyarrow")
        )
        for r in b.to_pylist()
    }
    avgdl = stats.get("", 0) / n_docs
    idf = {
        w: math.log((n_docs - stats.get(w, 0) + 0.5) / (stats.get(w, 0) + 0.5) + 1)
        for w in q
    }

    def score_block(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_id, out_s = [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            terms = _VOCAB_RE.findall((t or "").lower())
            tf = Counter(w for w in terms if w in qset)
            if not tf:
                continue
            dl = len(terms)
            s = 0.0
            for w in q:  # FIXED summation order — the oracle mirrors it
                c = tf.get(w)
                if c:
                    s += (
                        idf[w]
                        * (c * (BM25_K1 + 1))
                        / (c + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
                    )
            out_id.append(i)
            out_s.append(s)
        t = pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
            }
        )
        if t.num_rows > k:  # local top-k: only survivors shuffle
            order = pc.sort_indices(
                t, sort_keys=[("s", "descending"), ("doc_id", "ascending")]
            )
            t = t.take(order.slice(0, k))
        return t

    cands = ds.map_batches(score_block, batch_format="pyarrow").repartition(1)

    def final(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch, sort_keys=[("s", "descending"), ("doc_id", "ascending")]
        )
        top = batch.take(order.slice(0, k))
        return pa.table(
            {
                "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
                "doc_id": top["doc_id"].cast(pa.int64()),
            }
        )

    return cands.map_batches(final, batch_format="pyarrow", batch_size=None)


def term_first_doc_partial(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Partial (combiner) first-occurrence table for one batch:
    term -> min doc id within the block. Feeding a Min groupby these
    partials is the Heaps'-law scale shape — the shuffle carries one
    row per distinct term per block, never per-token rows, and Min is
    order-free so block layout cannot change the answer."""
    first: dict = {}
    ids = batch[id_col].to_pylist()
    for i, t in zip(ids, batch[text_col].to_pylist()):
        for term in set(_VOCAB_RE.findall((t or "").lower())):
            prev = first.get(term)
            if prev is None or i < prev:
                first[term] = i
    keys = list(first.keys())
    return pa.table(
        {
            "term": pa.array(keys, pa.string()),
            "fd": pa.array([first[k] for k in keys], pa.int64()),
        }
    )
