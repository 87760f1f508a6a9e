"""Stream-shaped windowed aggregates over an ordered event log.

Ray Data has no event-time windows/watermarks (ray_guide "Streaming-
shaped workloads"); the reference has none either (SURVEY §2.10). These
operators implement the standard shapes a training-data pipeline needs
over an ``events``-like table, with the documented ordering assumption:
events are processed grouped by key and sorted by ts within the group —
``groupby(key).map_groups`` provides exactly that.

* tumbling window: fixed buckets of ``window_us`` microseconds — pure
  vectorized bucketing + groupby (no per-group Python), SQL-expressible
  (GROUP BY floor(epoch_us/window)).
* session window: gaps > ``gap_us`` close a session — classic
  gaps-and-islands, per-key pandas inside map_groups; SQL oracle via
  window functions.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window(
    events: ray.data.Dataset,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (key, window) aggregate. The window id is assigned in a
    vectorized map_batches; the aggregate is one groupby (pre-bucketed,
    so the shuffle carries (key, window, partial) rows only)."""

    def bucket(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch[ts_col], pa.int64())
        win = pc.cast(
            pc.floor(pc.divide(pc.cast(ts_us, pa.float64()), float(window_us))),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: batch[key_col].cast(pa.int64()),
                "window_id": win,
                value_col: batch[value_col],
            }
        )

    out = (
        events.map_batches(bucket, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value_raw"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(b["sum_value_raw"], pa.scalar(100.0)), pa.scalar(0.5))
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: b[key_col],
                "window_id": b["window_id"],
                "n_events": b["n_events"].cast(pa.int64()),
                "sum_value_c": cents,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def session_windows(
    events: ray.data.Dataset,
    gap_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Sessionization: per key, sort by ts; a gap > gap_us starts a new
    session. Emits (key, session_id, n_events, start_ts, end_ts).
    Ordering assumption: map_groups hands each key's rows as one group;
    sorting within the group happens here (event-time, not arrival)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"]) if "event_id" in g else g.sort_values(ts_col)
        ts = g[ts_col].astype("int64")
        new_session = (ts.diff() > gap_us).fillna(False)
        sid = new_session.cumsum().astype("int64")
        g = g.assign(__sid=sid)
        out = (
            g.groupby("__sid")
            .agg(
                n_events=(ts_col, "size"),
                start_ts=(ts_col, "min"),
                end_ts=(ts_col, "max"),
            )
            .reset_index()
        )
        out[key_col] = g[key_col].iloc[0]
        return pd.DataFrame(
            {
                key_col: out[key_col].astype("int64"),
                "session_id": out["__sid"],
                "n_events": out["n_events"].astype("int64"),
                "start_ts": out["start_ts"],
                "end_ts": out["end_ts"],
            }
        )

    out = events.groupby(key_col).map_groups(sessions, batch_format="pandas")
    return out.map_batches(
        lambda b: pa.table(
            {
                key_col: b[key_col].cast(pa.int64()),
                "session_id": b["session_id"].cast(pa.int64()),
                "n_events": b["n_events"].cast(pa.int64()),
                "start_ts": b["start_ts"].cast(pa.timestamp("us")),
                "end_ts": b["end_ts"].cast(pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )


def sliding_window(
    events: ray.data.Dataset,
    window_us: int,
    hop_us: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Sliding/hopping windows: fixed ``window_us`` windows starting
    every ``hop_us`` (window_us must be a multiple of hop_us). Each
    event lands in exactly window/hop windows; window_id counts hops,
    window i covers [i*hop, i*hop + window).

    Scale shape: the fan-out (x window/hop rows) happens vectorized
    inside map_batches BEFORE the single (window_id, key) groupby — the
    shuffle carries pre-bucketed rows, never a per-event Python loop."""
    assert window_us % hop_us == 0
    ratio = window_us // hop_us

    def expand(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        ts_us = pc.cast(batch[ts_col], pa.int64()).to_numpy()
        base = np.floor_divide(ts_us, hop_us)
        # event belongs to windows base-0 .. base-(ratio-1); the key
        # column rides along via Arrow take (no Python materialization)
        win = np.repeat(base, ratio) - np.tile(np.arange(ratio, dtype=np.int64), n)
        idx = np.repeat(np.arange(n, dtype=np.int64), ratio)
        taken = batch.select([key_col]).take(pa.array(idx, pa.int64()))
        return taken.append_column("window_id", pa.array(win, pa.int64()))

    return (
        events.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_id", key_col])
        .aggregate(Count(alias_name="n_events"))
    )
