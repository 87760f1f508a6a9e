"""BPE trainer/encoder tests: clean-room naive-reference parity for
the merge loop (recount-from-scratch vs the incremental index),
determinism under block layout, encode round-trip, and the query
surface at sf0.001."""

import pyarrow as pa
import ray
import ray.data

from louis_crawler_legacy_ray.stages.bpe import (
    END,
    BpeEncoder,
    bpe_encode,
    bpe_merges_from_freqs,
    encode_word,
    train_bpe,
    word_freqs,
)


def naive_bpe(freqs: dict[str, int], n_merges: int):
    """Textbook O(V*L) recount-per-iteration BPE — independent of the
    incremental implementation under test."""
    words = {w: list(w) + [END] for w in freqs if w}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in words.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        live = {p: c for p, c in counts.items() if c >= 2}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


FREQS = {
    "low": 5,
    "lower": 2,
    "lowest": 6,
    "newer": 6,
    "wider": 3,
    "new": 2,
    "a": 1,
}


def test_merges_match_naive_reference():
    for n in (1, 5, 20, 200):
        assert bpe_merges_from_freqs(dict(FREQS), n) == naive_bpe(dict(FREQS), n)


def test_merges_learn_expected_units():
    merges = bpe_merges_from_freqs(dict(FREQS), 50)
    vocab = {a + b for a, b in merges}
    # ('w','e') is the top pair (lower 2 + lowest 6 + newer 6 = 14),
    # and the heavy words merge all the way to whole-word units
    assert merges[0] == ("w", "e")
    assert {"we", "lo", "lowest" + END, "newer" + END} <= vocab
    # early-stop: no pair left with count >= 2 well before 50
    assert len(merges) < 50


def test_merges_repartition_invariant(ray_session):
    rows = [
        {"doc_id": i, "text": "low lower lowest newer wider new " * (1 + i % 3)}
        for i in range(40)
    ]
    one = train_bpe(ray.data.from_items(rows).repartition(1), 30)
    many = train_bpe(ray.data.from_items(rows).repartition(11), 30)
    assert one == many and len(one) > 0


def test_word_freqs_and_cap(ray_session):
    rows = [{"doc_id": 0, "text": "aa bb aa cc aa bb"}]
    wf = {
        r["word"]: r["cnt"]
        for r in word_freqs(ray.data.from_items(rows)).iter_rows()
    }
    assert wf == {"aa": 3, "bb": 2, "cc": 1}
    capped = train_bpe(ray.data.from_items(rows), 10, max_words=2)
    # only 'aa' and 'bb' survive the cap; both still yield merges
    assert all(set(a + b) <= set("ab" + END) for a, b in capped)


def test_encode_round_trip_and_cache():
    merges = bpe_merges_from_freqs(dict(FREQS), 200)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(FREQS) + ["unseenword", "xyzzy123"]:
        toks = encode_word(w, ranks)
        assert "".join(toks).removesuffix(END) == w
    # trained words compress below character count
    assert len(encode_word("lowest", ranks)) < len("lowest") + 1


def test_encoder_stage_and_query(ray_session):
    rows = [
        {"doc_id": i, "text": "low lower lowest newer wider new"}
        for i in range(10)
    ] + [{"doc_id": 99, "text": "???"}]
    out = bpe_encode(ray.data.from_items(rows), n_merges=50).to_pandas()
    assert set(out["doc_id"]) == set(range(10))  # featureless doc skipped
    assert out["round_trip_ok"].all()
    assert (out["n_tokens"] >= out["n_words"]).all()
    assert (out["n_tokens"] <= out["n_words"] * (2 + max(len(w) for w in FREQS))).all()


def test_query_surface_sf0001(ray_session):
    from louis_crawler_legacy_ray.pipelines.queries import (
        q_bpe_encode,
        q_bpe_merges,
    )

    merges = q_bpe_merges("/root/testdata/sf0.001")
    assert isinstance(merges, pa.Table) and merges.num_rows > 0
    assert merges.column_names == ["rank", "left", "right"]
    enc = q_bpe_encode("/root/testdata/sf0.001").to_pandas()
    assert len(enc) > 0 and enc["round_trip_ok"].all()
    # learned merges compress the corpus: strictly fewer tokens than
    # chars+end-markers, i.e. somewhere a merge applied
    assert (enc["n_tokens"] < enc["n_words"] * 30).all()
    assert (enc["n_tokens"].sum()) > 0


def test_bpe_token_encoder_drives_chunker(ray_session):
    """The chunker's tokenizer seam accepts the corpus-trained BPE
    (the same seam the reference swaps tiktoken through,
    chunking.py:10): the <=512-token invariant holds in BPE units and
    token counts are consistent with direct encoding."""
    from louis_crawler_legacy_ray.functions.chunking import chunk_html
    from louis_crawler_legacy_ray.stages.bpe import BpeTokenEncoder

    rows = [
        {"doc_id": i, "text": "low lower lowest newer wider new " * 30}
        for i in range(8)
    ]
    merges = train_bpe(ray.data.from_items(rows), 30)
    enc = BpeTokenEncoder(merges)
    body = "<p>" + "low lower lowest newer wider new. " * 120 + "</p>"
    html = f"<html><body><main><h1>T</h1>{body}{body}</main></body></html>"
    chunks = chunk_html(html, enc)
    assert len(chunks) >= 2  # big page must split
    for c in chunks:
        assert c["token_count"] <= 512
        assert c["token_count"] == len(enc.encode(c["text_content"]))
    # deterministic across instances (fresh cache)
    again = chunk_html(html, BpeTokenEncoder(merges))
    assert [c["token_count"] for c in chunks] == [
        c["token_count"] for c in again
    ]


def test_bpe_token_encoder_contract():
    merges = bpe_merges_from_freqs(dict(FREQS), 50)
    from louis_crawler_legacy_ray.stages.bpe import BpeTokenEncoder

    enc = BpeTokenEncoder(merges)
    assert enc.count("") == 0
    assert enc.count("...") == 3          # marks are one token each
    assert enc.encode("LOW low") == enc.encode("low LOW")  # lowercased
    assert all(isinstance(i, int) and 0 <= i < 2**31
               for i in enc.encode("lowest unseen9 ?!"))
