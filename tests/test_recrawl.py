"""Adaptive recrawl scheduler tests beyond the DuckDB oracles:
frequency-greedy ranking properties, observation-gap semantics,
block-layout invariance, duplicate-observation determinism, and the
pivot-width guard."""

import pyarrow as pa
import pytest
import ray.data

from louis_crawler_legacy_ray.stages.recrawl import (
    content_fp64,
    recrawl_priorities,
)


def _obs(rows):
    return ray.data.from_items(
        [{"url": u, "snap": s, "content": c} for u, s, c in rows]
    )


def _pri(ds, k=4, **kw):
    return {
        r["url"]: r
        for r in recrawl_priorities(ds, n_snaps=k, **kw).iter_rows()
    }


def test_frequency_greedy_ranking(ray_session):
    rows = []
    # 'hot' changes every snapshot; 'warm' changed once, early;
    # 'cold' never changes
    for t in range(4):
        rows.append(("hot", t, f"v{t}"))
        rows.append(("warm", t, "a" if t == 0 else "b"))
        rows.append(("cold", t, "same"))
    got = _pri(_obs(rows))
    assert got["hot"]["n_changes"] == 3
    assert got["hot"]["last_changed"] == 3 and got["hot"]["staleness"] == 0
    assert got["warm"]["n_changes"] == 1 and got["warm"]["last_changed"] == 1
    assert got["cold"]["n_changes"] == 0 and got["cold"]["staleness"] == 3
    assert (
        got["hot"]["priority"]
        > got["warm"]["priority"]
        > got["cold"]["priority"]
    )
    assert all(r["present"] for r in got.values())


def test_staleness_breaks_ties(ray_session):
    # both changed once; 'early' longer ago -> more stale -> higher
    rows = []
    for t in range(4):
        rows.append(("early", t, "a" if t == 0 else "b"))
        rows.append(("late", t, "a" if t < 3 else "b"))
    got = _pri(_obs(rows))
    assert got["early"]["n_changes"] == got["late"]["n_changes"] == 1
    assert got["early"]["priority"] > got["late"]["priority"]


def test_gaps_contribute_no_change(ray_session):
    # content differs across the gap (t0 'a' -> t2 'b') but neither
    # pair (0,1) nor (1,2) was fully observed -> no change counted
    rows = [("gappy", 0, "a"), ("gappy", 2, "b"), ("gappy", 3, "b")]
    got = _pri(_obs(rows))
    g = got["gappy"]
    assert g["n_obs"] == 3 and g["n_changes"] == 0 and g["present"]
    # absent from the final snapshot -> not recrawlable now
    rows2 = [("gone", t, f"v{t}") for t in range(3)]
    assert not _pri(_obs(rows2))["gone"]["present"]


def test_block_layout_and_duplicate_obs_invariance(ray_session):
    rows = [
        (f"u{i}", t, f"c{(i * 7 + t) % 3}") for i in range(40) for t in range(4)
    ]
    # duplicate observation rows (same key+snap+content) must not
    # change anything, at any block layout
    dup = rows + rows[:17]
    a = sorted(
        recrawl_priorities(_obs(rows).repartition(1), 4).take_all(),
        key=lambda r: r["url"],
    )
    b = sorted(
        recrawl_priorities(_obs(dup).repartition(13), 4).take_all(),
        key=lambda r: r["url"],
    )
    assert a == b


def test_fp_col_path_matches_content_path(ray_session):
    rows = [(f"u{i}", t, f"c{(i + t) % 2}") for i in range(20) for t in range(4)]
    ds = _obs(rows)

    def add_fp(b: pa.Table) -> pa.Table:
        return b.append_column(
            "fp", pa.array(content_fp64(b["content"].to_pylist()), pa.int64())
        )

    via_fp = recrawl_priorities(
        ds.map_batches(add_fp, batch_format="pyarrow"), 4, fp_col="fp"
    ).take_all()
    via_content = recrawl_priorities(ds, 4).take_all()
    key = lambda r: r["url"]  # noqa: E731
    assert sorted(via_fp, key=key) == sorted(via_content, key=key)


def test_pivot_width_guard():
    with pytest.raises(ValueError):
        recrawl_priorities(None, n_snaps=1)
    with pytest.raises(ValueError):
        recrawl_priorities(None, n_snaps=65)


def test_freshness_metrics_direct(ray_session):
    """Freshness/age classification on a hand-built observation set:
    change at snap 2 only; refresh at 1 -> stale with age 1; refresh
    at 2 or 3 -> fresh; unchanged doc always fresh."""
    import pyarrow as pa
    import ray.data

    from louis_crawler_legacy_ray.stages.recrawl import freshness_metrics

    rows = []
    for key, refresh, change_at in ((1, 1, 2), (2, 2, 2), (3, 3, 2), (4, 0, None)):
        for t in range(4):
            content = "x" if (change_at is None or t < change_at) else "y"
            rows.append(
                {"url": key, "snap": t, "refresh_snap": refresh, "content": content}
            )
    out = (
        freshness_metrics(ray.data.from_items(rows).repartition(3), n_snaps=4)
        .to_pandas()
        .set_index("url")
    )
    assert not out.loc[1, "fresh"] and out.loc[1, "age"] == 1
    assert out.loc[2, "fresh"] and out.loc[2, "age"] == 0
    assert out.loc[3, "fresh"] and out.loc[3, "age"] == 0
    assert out.loc[4, "fresh"] and out.loc[4, "age"] == 0


def test_change_rate_classes_hand_window(ray_session):
    """change_rate_classes: hand-built 4-snapshot window pins the
    estimator. Key a changes every interval (X=3,n=3 -> hot, revisit
    1); key b never changes (X=0,n=3 -> cold, revisit 8); key c has a
    gap at snapshot 1 so only the (2,3) pair is observed and its one
    change gives X=1,n=1 -> r-hat=1/3 <= 1/2 -> warm, revisit 2."""
    import ray.data

    from louis_crawler_legacy_ray.stages.recrawl import change_rate_classes

    rows = []
    for t in range(4):
        rows.append({"url": "a", "snap": t, "content": f"v{t}"})
        rows.append({"url": "b", "snap": t, "content": "same"})
        if t != 1:
            rows.append(
                {"url": "c", "snap": t, "content": "x" if t < 3 else "y"}
            )
    obs = ray.data.from_items(rows)
    out = {
        r["url"]: r
        for r in change_rate_classes(obs, n_snaps=4).take_all()
    }
    assert (out["a"]["n_intervals"], out["a"]["x_changes"]) == (3, 3)
    assert (out["a"]["freq_class"], out["a"]["revisit_rounds"]) == (3, 1)
    assert (out["b"]["n_intervals"], out["b"]["x_changes"]) == (3, 0)
    assert (out["b"]["freq_class"], out["b"]["revisit_rounds"]) == (0, 8)
    assert (out["c"]["n_intervals"], out["c"]["x_changes"]) == (1, 1)
    assert (out["c"]["freq_class"], out["c"]["revisit_rounds"]) == (2, 2)
