"""snapshot_delta stage: planted statuses, payloads never shuffled
(fingerprint reduction), and block-layout invariance."""

import ray.data

from louis_crawler_legacy_ray.stages.joins import snapshot_delta


def _run(old_rows, new_rows, parts=3):
    old = ray.data.from_items(old_rows).repartition(parts)
    new = ray.data.from_items(new_rows).repartition(parts)
    out = snapshot_delta(old, new, key_col="url", content_col="body")
    return {r["url"]: r["status"] for r in out.iter_rows()}


def test_planted_statuses(ray_session):
    old = [
        {"url": "a", "body": "one"},
        {"url": "b", "body": "two"},
        {"url": "c", "body": "three"},
    ]
    new = [
        {"url": "a", "body": "one"},      # same
        {"url": "b", "body": "two v2"},   # changed
        {"url": "d", "body": "four"},     # added
    ]                                      # c deleted
    got = _run(old, new)
    assert got == {"a": "same", "b": "changed", "c": "deleted", "d": "added"}


def test_layout_invariance_and_empty_sides(ray_session):
    old = [{"url": f"u{i}", "body": f"b{i}"} for i in range(40)]
    new = [{"url": f"u{i}", "body": f"b{i}" + (" x" if i % 5 == 0 else "")}
           for i in range(10, 50)]
    assert _run(old, new, parts=1) == _run(old, new, parts=13)
    got = _run(old, new)
    assert got["u3"] == "deleted" and got["u45"] == "added"
    assert got["u15"] == "changed" and got["u11"] == "same"
