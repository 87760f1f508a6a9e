"""Golden stability pins for the tokenizer stand-in: exact token ids
for fixed inputs. Chunk reproducibility across runs/rounds (and the
deterministic chunk_id/anti-join chain built on it) depends on these
ids never drifting — any change to the pre-tokenizer regex or the hash
must be deliberate and bump this golden."""

from louis_crawler_legacy_ray.functions.tokenizer import Encoder


def test_token_ids_golden():
    enc = Encoder()
    # pin a handful of exact ids (blake2b-4 of the token string, 31-bit)
    assert enc.encode("food") == [622552535]
    assert enc.encode("Food safety 123.") == [
        98957046,
        826109369,
        70383889,
        1487344266,
    ]
    assert enc.encode("") == []
    # leading-space word tokens differ from bare words (BPE-like)
    assert enc.encode("a a")[0] != enc.encode("a a")[1]


def test_counts_match_encode():
    enc = Encoder()
    for s in ("", "one", "one two three", "l'agence, 2024-01-01!"):
        assert enc.count(s) == len(enc.encode(s))
