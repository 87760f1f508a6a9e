"""CCNet-style perplexity bucketing (train_bigram_lm / PerplexityScorer
/ ntile rule) — oracle parity is covered by selfcheck (sf0.001+sf0.01
hash match); these pin the stage-level semantics."""

import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.textstats import (
    PerplexityScorer,
    ntile_of_rank,
    train_bigram_lm,
)


def test_ntile_rule_matches_sql_semantics():
    # n=7, tiles=3 -> bucket sizes 3,2,2 (first n%tiles buckets get +1)
    got = [ntile_of_rank(r, 7, 3) for r in range(1, 8)]
    assert got == [1, 1, 1, 2, 2, 3, 3]
    # even split
    assert [ntile_of_rank(r, 6, 3) for r in range(1, 7)] == [1, 1, 2, 2, 3, 3]
    # fewer rows than tiles
    assert [ntile_of_rank(r, 2, 3) for r in range(1, 3)] == [1, 2]


def test_scorer_known_counts(ray_session):
    # train on one doc: "a b a b" -> cu={a:2,b:2}, cb={(a,b):2,(b,a):1}, V=2
    train = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["a b a b"]})
    )
    cb_ref, cu_ref, v = train_bigram_lm(train)
    assert v == 2
    scorer = PerplexityScorer(cb_ref, cu_ref, v)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a b", "z z", "solo"],
        }
    )
    out = scorer(batch)
    # doc 3 has one token -> dropped
    assert out["doc_id"].to_pylist() == [1, 2]
    import math

    # p(b|a) = (2+1)/(2+2) = 0.75 -> nll_c = round(-ln(0.75)*1e4)
    assert out["nll_c"][0].as_py() == round(-math.log(0.75) * 10000)
    # unseen context z: p = (0+1)/(0+2) = 0.5
    assert out["nll_c"][1].as_py() == round(-math.log(0.5) * 10000)


def test_buckets_are_terciles(ray_session):
    from louis_crawler_legacy_ray.pipelines.queries import q_perplexity_buckets

    df = q_perplexity_buckets("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    sizes = df.groupby("bucket").size()
    assert sorted(sizes.index) == [1, 2, 3]
    assert sizes.max() - sizes.min() <= 1
    # head bucket strictly precedes tail in nll
    assert df[df.bucket == 1].nll_c.max() <= df[df.bucket == 3].nll_c.min()
