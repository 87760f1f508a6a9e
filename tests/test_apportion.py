"""Largest-remainder budget apportionment properties: exact total,
within-1-of-share, deterministic remainder tie-break, layout
invariance, more-hosts-than-budget, and the int64-overflow route."""

import math

import pytest
import ray.data

from louis_crawler_legacy_ray.stages.apportion import apportion_budgets


def _counts(pairs):
    return ray.data.from_items([{"host": h, "n": n} for h, n in pairs])


def _alloc(pairs, budget, **kw):
    return {
        r["host"]: r["budget"]
        for r in apportion_budgets(_counts(pairs), budget, **kw).iter_rows()
    }


def test_exact_total_and_within_one(ray_session):
    pairs = [(f"h{i}", (i * 37) % 101 + 1) for i in range(23)]
    total = sum(n for _, n in pairs)
    got = _alloc(pairs, 1000)
    assert sum(got.values()) == 1000
    for h, n in pairs:
        share = 1000 * n / total
        assert math.floor(share) <= got[h] <= math.ceil(share)


def test_remainder_tiebreak_is_key_ascending(ray_session):
    # four equal hosts, budget 6: everyone floors to 1, remainder
    # identical -> the two bonus units go to the lexicographically
    # smallest keys
    got = _alloc([("a", 5), ("b", 5), ("c", 5), ("d", 5)], 6)
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_more_hosts_than_budget(ray_session):
    pairs = [(f"h{i:02d}", 1) for i in range(10)]
    got = _alloc(pairs, 3)
    assert sum(got.values()) == 3
    assert set(got.values()) == {0, 1}
    # equal counts -> bonus by key order
    assert [h for h, v in sorted(got.items()) if v == 1] == [
        "h00", "h01", "h02"
    ]


def test_block_layout_invariance(ray_session):
    pairs = [(f"h{i}", (i * 13) % 29 + 1) for i in range(40)]
    one = sorted(
        apportion_budgets(_counts(pairs).repartition(1), 500).take_all(),
        key=lambda r: r["host"],
    )
    many = sorted(
        apportion_budgets(_counts(pairs).repartition(11), 500).take_all(),
        key=lambda r: r["host"],
    )
    assert one == many


def test_python_int_overflow_route(ray_session):
    # B * n overflows int64 -> the arbitrary-precision path must agree
    # with exact arithmetic (remainders still < N so they fit)
    big = 2**40
    pairs = [("a", big), ("b", big + 1), ("c", 7)]
    budget = 2**24
    got = _alloc(pairs, budget)
    total = sum(n for _, n in pairs)
    assert sum(got.values()) == budget
    for h, n in pairs:
        assert abs(got[h] - budget * n / total) < 1


def test_negative_budget_rejected():
    with pytest.raises(ValueError):
        apportion_budgets(None, -1)
