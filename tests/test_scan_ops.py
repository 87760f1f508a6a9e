"""Unit tests for the distributed prefix scan (stages/scan.py) and the
curation operators built on it (token-budget select, sequence packing,
seeded shuffle ranks) plus the PII / repetition kernels — beyond the
DuckDB oracles: block-layout invariance, naive-recompute parity, and
edge cases the synthetic corpus does not exercise."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from louis_crawler_legacy_ray.stages.scan import (
    hex_prefix_bucket,
    prefix_sum,
    range_bucket,
)
from louis_crawler_legacy_ray.stages.textstats import (
    pii_redact_batch,
    repetition_batch,
)


def _scan_df(ds, order, val, bucket_fn):
    df = prefix_sum(ds, order, val, bucket_fn).to_pandas()
    return df.sort_values(order).reset_index(drop=True)


def test_prefix_sum_matches_numpy_cumsum(ray_session):
    vals = [(i * 37) % 11 + 1 for i in range(500)]
    rows = [{"id": i, "v": v} for i, v in enumerate(vals)]
    df = _scan_df(ray.data.from_items(rows), ["id"], "v", range_bucket("id", 32))
    incl = np.cumsum(vals)
    assert list(df["prefix_incl"]) == list(incl)
    assert list(df["prefix_excl"]) == list(incl - np.asarray(vals))


def test_prefix_sum_block_layout_invariant(ray_session):
    rows = [{"id": i, "v": 1 + i % 7} for i in range(300)]
    one = _scan_df(ray.data.from_items(rows).repartition(1), ["id"], "v",
                   range_bucket("id", 50))
    many = _scan_df(ray.data.from_items(rows).repartition(16), ["id"], "v",
                    range_bucket("id", 50))
    assert list(one["prefix_incl"]) == list(many["prefix_incl"])


def test_prefix_sum_sparse_and_single_bucket(ray_session):
    # ids with huge gaps -> many empty buckets; width larger than the
    # id range -> a single bucket; both must still be exact
    ids = [3, 1000, 54321, 999999]
    rows = [{"id": i, "v": 5} for i in ids]
    df = _scan_df(ray.data.from_items(rows), ["id"], "v", range_bucket("id", 64))
    assert list(df["prefix_excl"]) == [0, 5, 10, 15]
    df1 = _scan_df(ray.data.from_items(rows), ["id"], "v",
                   range_bucket("id", 10**9))
    assert list(df1["prefix_excl"]) == [0, 5, 10, 15]


def test_hex_prefix_rank_matches_sorted_order(ray_session):
    keys = [hashlib.md5(f"s:{i}".encode()).hexdigest() for i in range(200)]
    rows = [{"k": k, "one": 1} for k in keys]
    df = prefix_sum(
        ray.data.from_items(rows).repartition(8), ["k"], "one",
        hex_prefix_bucket("k"),
    ).to_pandas()
    got = dict(zip(df["k"], df["prefix_excl"]))
    for rank, k in enumerate(sorted(keys)):
        assert got[k] == rank


def test_pii_redact_kernel():
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "props": pa.array(
                ["mail bob.smith+x@exa-mple.co now", "k=4711, j=0", "clean"]
            ),
        }
    )
    out = pii_redact_batch(t)
    assert out["props_clean"].to_pylist() == [
        "mail <EMAIL> now",
        "k=<NUM>, j=<NUM>",
        "clean",
    ]


def test_repetition_kernel_edges():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a a a", "w x y z", ""]),
        }
    )
    out = repetition_batch(t)
    assert out["dup_frac"].to_pylist() == [0.75, 0.0, 0.0]
    assert out["keep"].to_pylist() == [False, True, True]


def test_pack_sequences_spans_bins(ray_session, tmp_path):
    # three 300-token docs at capacity 512: doc0 [0,300) bin 0;
    # doc1 [300,600) spans bins 0-1; doc2 [600,900) bin 1
    import louis_crawler_legacy_ray.pipelines.queries as q

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([" ".join(["tok"] * 300)] * 3),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    df = q.q_pack_sequences(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(df["bin_start"]) == [0, 0, 1]
    assert list(df["bin_end"]) == [0, 1, 1]
    assert list(df["bin_offset"]) == [0, 300, 88]


def test_customer_distribution_keeps_zero_bucket(ray_session, tmp_path):
    """Q13 LEFT-join gate: a customer with no qualifying orders (none
    at all, or only urgent ones filtered at the JOIN) lands in the
    c_count = 0 bucket instead of vanishing."""
    import pyarrow.parquet as pq

    from louis_crawler_legacy_ray.pipelines.queries import (
        q_customer_distribution,
    )

    sf = str(tmp_path)
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        f"{sf}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 3], pa.int64()),
                "o_orderpriority": pa.array(
                    ["2-HIGH", "5-LOW", "1-URGENT"], pa.string()
                ),
            }
        ),
        f"{sf}/orders.parquet",
    )
    out = q_customer_distribution(sf)
    got = {r["c_count"]: r["custdist"] for r in out.take_all()}
    # cust 1 -> 2 orders; cust 3 -> only urgent (filtered) -> 0;
    # cust 2, 4 -> no orders -> 0
    assert got == {2: 1, 0: 3}


def test_cdx_shards_balance_and_ranges(ray_session):
    """cdx_shards: 16 shards, sizes differ by <= 1, ranges are
    disjoint and ordered by shard id, totals cover every record."""
    from louis_crawler_legacy_ray.pipelines.queries import q_cdx_shards

    out = (
        q_cdx_shards("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("shard_id")
        .reset_index(drop=True)
    )
    assert list(out["shard_id"]) == list(range(16))
    sizes = out["n_records"]
    assert sizes.max() - sizes.min() <= 1
    for i in range(1, 16):
        assert out.loc[i - 1, "hi_key"] <= out.loc[i, "lo_key"]
