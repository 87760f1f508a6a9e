"""Unit tests for the stratified sampler, C4 line filter, and vocab
combiner — beyond the DuckDB oracle: block-layout invariance and edge
cases the synthetic corpus does not exercise."""

import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages import textstats as ts
from louis_crawler_legacy_ray.stages.sample import sample_hash, stratified_sample


def _sample_ids(ds, k):
    out = stratified_sample(ds, key_col="lang", id_col="doc_id", k=k).to_pandas()
    return sorted(map(tuple, out[["lang", "doc_id"]].itertuples(index=False)))


def test_stratified_sample_block_layout_invariant(ray_session):
    rows = [{"doc_id": i, "lang": ["en", "fr", "de"][i % 3]} for i in range(200)]
    one = ray.data.from_items(rows).repartition(1)
    many = ray.data.from_items(rows).repartition(16)
    assert _sample_ids(one, 4) == _sample_ids(many, 4)


def test_stratified_sample_matches_naive(ray_session):
    import numpy as np

    rows = [{"doc_id": i, "lang": "en" if i < 60 else "fr"} for i in range(100)]
    got = _sample_ids(ray.data.from_items(rows), 3)
    expect = []
    for lang, lo, hi in [("en", 0, 60), ("fr", 60, 100)]:
        ids = np.arange(lo, hi)
        order = np.lexsort((ids, sample_hash(ids)))
        expect += [(lang, int(ids[j])) for j in order[:3]]
    assert got == sorted(expect)


def test_stratified_sample_small_stratum(ray_session):
    rows = [{"doc_id": 1, "lang": "xx"}, {"doc_id": 2, "lang": "xx"}]
    assert len(_sample_ids(ray.data.from_items(rows), 5)) == 2


def test_c4_line_filter_edges():
    b = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "",  # empty doc -> one empty line, nothing kept
                "Ends with period but two words.",  # wait: 5 words, kept
                "short one.\r",  # CR before EOL: \s* absorbs it, <3 words
                'He said "stop".\nNo terminal punct\nThree words here!',
            ],
        }
    )
    out = ts.c4_line_filter_batch(b).to_pydict()
    assert out["n_lines"] == [1, 1, 1, 3]
    assert out["n_kept"] == [0, 1, 0, 2]
    assert out["clean_text"][3] == 'He said "stop".\nThree words here!'
    assert out["keep"] == [False, True, False, True]


def test_vocab_partial_counts_df_once_per_doc():
    b = pa.table({"doc_id": [1, 2], "text": ["a a a b", "a c"]})
    out = ts.vocab_partial_batch(b)
    d = {r["term"]: (r["total_tf"], r["df"]) for r in out.to_pylist()}
    assert d == {"a": (4, 2), "b": (1, 1), "c": (1, 1)}


def test_interval_join_overlap_duplicates(ray_session):
    """An event inside two overlapping intervals must emit two rows;
    an event outside all intervals must drop."""
    import pyarrow as pa
    import ray.data

    from louis_crawler_legacy_ray.stages.joins import broadcast_interval_join

    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([50, 150, 999], pa.timestamp("us")),
                "tag": ["first_only", "both", "neither"],
            }
        )
    )
    out = broadcast_interval_join(
        ev, starts_us=[0, 100], ends_us=[200, 300]
    ).to_pandas()
    got = sorted(zip(out["tag"], out["interval_start_us"]))
    assert got == [("both", 0), ("both", 100), ("first_only", 0)]


def test_sliding_window_membership(ray_session):
    """Each event contributes to exactly window/hop windows and the
    window ids cover [t-window, t] hops."""
    import pyarrow as pa
    import ray.data

    from louis_crawler_legacy_ray.stages.windows import sliding_window

    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([1000], pa.timestamp("us")),
                "event_type": ["x"],
            }
        )
    )
    out = sliding_window(ev, window_us=400, hop_us=100).to_pandas()
    assert sorted(out["window_id"]) == [7, 8, 9, 10]
    assert (out["n_events"] == 1).all()


def test_grouped_topk_combiner_matches_single_block(ray_session):
    """grouped_topk must be invariant to block layout (the per-batch
    combiner may not change the global answer) and rank ties by the
    tiebreak column ascending."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from louis_crawler_legacy_ray.stages.sample import grouped_topk

    rng = np.random.RandomState(3)
    t = pa.table(
        {
            "k": pa.array(rng.randint(0, 5, 300), pa.int64()),
            "id": pa.array(np.arange(300), pa.int64()),
            "v": pa.array(rng.randint(0, 10, 300), pa.int64()),  # many ties
        }
    )

    def run(n_blocks):
        out = grouped_topk(
            ray.data.from_arrow(t).repartition(n_blocks),
            key_col="k", order_col="v", k=3, tiebreak_col="id",
        ).to_pandas()
        return sorted(map(tuple, out[["k", "id", "v", "rank"]].itertuples(index=False)))

    one, many = run(1), run(12)
    assert one == many
    # rank 1 of each key is the max v with the smallest id among maxes
    import pandas as pd
    df = t.to_pandas()
    for k, g in df.groupby("k"):
        top = g.sort_values(["v", "id"], ascending=[False, True]).iloc[0]
        assert (k, top["id"], top["v"], 1) in one


def test_quota_mix_quotas_and_layout_invariance(ray_session):
    from louis_crawler_legacy_ray.stages.sample import quota_mix

    rows = [
        {"doc_id": i, "lang": ["en", "fr", "de", "xx"][i % 4]}
        for i in range(400)
    ]
    quotas = {"en": 30, "fr": 10, "de": 500}  # de quota > stratum; xx absent

    def run(ds):
        out = quota_mix(ds, key_col="lang", id_col="doc_id", quotas=quotas)
        return out.to_pandas()

    one = run(ray.data.from_items(rows).repartition(1))
    many = run(ray.data.from_items(rows).repartition(16))
    a = sorted(map(tuple, one[["lang", "doc_id"]].itertuples(index=False)))
    b = sorted(map(tuple, many[["lang", "doc_id"]].itertuples(index=False)))
    assert a == b
    counts = one.groupby("lang")["doc_id"].count().to_dict()
    assert counts == {"en": 30, "fr": 10, "de": 100}  # whole de stratum, no xx
    # the selected en ids are exactly the 30 smallest by hash rank
    import numpy as np

    from louis_crawler_legacy_ray.stages.sample import sample_hash

    en_ids = np.array([i for i in range(400) if i % 4 == 0], dtype=np.int64)
    order = np.lexsort((en_ids, sample_hash(en_ids)))
    expect = sorted(en_ids[order][:30].tolist())
    got = sorted(one[one["lang"] == "en"]["doc_id"].tolist())
    assert got == expect


def test_dup_doc_coverage_known_counts(ray_session):
    from louis_crawler_legacy_ray.stages.dedup import dup_doc_coverage

    shared = "alpha beta gamma delta epsilon"  # one 5-gram, shared
    rows = [
        {"doc_id": 1, "text": shared + " zeta"},   # grams: shared+1 unique
        {"doc_id": 2, "text": shared},              # gram: shared only
        {"doc_id": 3, "text": "one two three four five six"},  # 2 unique grams
        {"doc_id": 4, "text": "too short"},         # dropped (<5 words)
    ]
    out = (
        dup_doc_coverage(ray.data.from_items(rows).repartition(3), n_buckets=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_dup_grams"] == 1
    assert out.loc[2, "n_grams"] == 1 and out.loc[2, "n_dup_grams"] == 1
    assert out.loc[3, "n_grams"] == 2 and out.loc[3, "n_dup_grams"] == 0
