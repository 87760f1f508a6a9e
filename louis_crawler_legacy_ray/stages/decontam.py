"""Benchmark decontamination: drop corpus documents that share any
word n-gram with a benchmark/test set.

The standard LLM-training hygiene step (n-gram overlap decontamination
a la GPT-3 appendix C / FLAN): the benchmark side is *small* (test
sets, ~10^5..10^6 n-grams even for large eval suites), so the scale
shape is broadcast-semi-join — materialize the benchmark's distinct
n-grams once, ``ray.put`` the set, and stream the corpus through a
``map_batches`` filter that drops any document whose n-gram set
intersects it. One corpus pass, no shuffle; the only state shipped to
workers is the benchmark n-gram set (once per worker via the object
store, not per batch).

The n-grams are plain space-joined word windows (the DuckDB oracle
recomputes them with list_slice over string_split), hashed only inside
the worker-side set for memory; semantics are defined on the strings.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def doc_ngrams(text: str, n: int) -> set[str]:
    """Distinct space-joined word n-grams of one document."""
    words = text.split(" ") if text else []
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def benchmark_ngrams(
    bench_ds: ray.data.Dataset, n: int, text_col: str = "text"
) -> set[str]:
    """Distinct n-grams of the benchmark set. The per-batch partial is
    already a set, so the driver receives one deduped set per block —
    bounded by benchmark size, not corpus size."""

    def partial(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch[text_col].to_pylist():
            grams |= doc_ngrams(t or "", n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    out: set[str] = set()
    deduped = bench_ds.map_batches(partial, batch_format="pyarrow")
    for b in deduped.iter_batches(batch_format="pyarrow"):
        out.update(b["gram"].to_pylist())
    return out


def decontaminate(
    corpus: ray.data.Dataset,
    bench_grams: set[str],
    n: int,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Filter the corpus to documents sharing NO n-gram with the
    benchmark set. ``bench_grams`` travels via ``ray.put`` once; the
    filter closure carries only the (tiny) object ref."""
    grams_ref = ray.put(bench_grams)

    def keep(batch: pa.Table) -> pa.Table:
        grams: set[str] = ray.get(grams_ref)
        texts = batch[text_col].to_pylist()
        mask = pa.array(
            [doc_ngrams(t or "", n).isdisjoint(grams) for t in texts],
            pa.bool_(),
        )
        return batch.filter(mask)

    return corpus.map_batches(keep, batch_format="pyarrow")
