"""Per-round, per-shard Parquet checkpoints with lineage metadata.

Replaces the reference's append-only scraped/pending/errored files and
full-file pending rewrites (goldie_playwright_parallel.py:514-645) with
the layout the north_rule asks for:

    ckpt_dir/
      round=000003/
        shard=0000/{seen,pending,errored}.parquet
        ...
        _lineage.json        <- written LAST via temp+rename: the commit
                                marker {round, config_hash, counts}

A round directory without ``_lineage.json`` is incomplete and ignored
by resume (atomicity). Note: empty tables ARE written (a round with
zero errored urls still checkpoints an empty errored.parquet) — a
completed round is detected by its manifest, never by file presence.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _round_dir(ckpt_dir: str, round_no: int) -> str:
    return os.path.join(ckpt_dir, f"round={round_no:06d}")


def write_checkpoint(
    ckpt_dir: str,
    round_no: int,
    shards: list,
    config_hash: str,
    metrics: dict,
    partial_attempt: int | None = None,
) -> str:
    """Dump every shard's state; commit with _lineage.json last.

    ``partial_attempt`` marks a MID-ROUND salvage checkpoint (graceful
    SIGTERM): state goes to ``round=N.partial`` — invisible to
    latest_complete_round (the '.' transient filter) but discovered by
    partial_round() — and resume re-runs round N over the salvaged
    pending remainder, tagging its outputs with attempt+1."""
    final = _round_dir(ckpt_dir, round_no)
    if partial_attempt is not None:
        final += ".partial"
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    dumps = ray.get([s.dump.remote() for s in shards])
    counts = {"seen": 0, "pending": 0, "errored": 0}
    for d in dumps:
        sdir = os.path.join(tmp, f"shard={d['shard']:04d}")
        os.makedirs(sdir, exist_ok=True)
        for name in ("seen", "pending", "errored"):
            pq.write_table(d[name], os.path.join(sdir, f"{name}.parquet"))
            counts[name] += d[name].num_rows
        # politeness carry (token_bucket banked tokens) rides the same
        # per-shard dump so resumed crawls schedule identically
        if "host_tokens" in d:
            pq.write_table(
                d["host_tokens"], os.path.join(sdir, "host_tokens.parquet")
            )
        # transient-failure backoff state (written only when non-empty:
        # retry-free crawls keep the r3 checkpoint layout byte-for-byte)
        if d.get("retries") is not None and d["retries"].num_rows:
            pq.write_table(d["retries"], os.path.join(sdir, "retries.parquet"))
        # live citation counts (backlink_desc adaptive priority)
        if d.get("backlinks") is not None and d["backlinks"].num_rows:
            pq.write_table(
                d["backlinks"], os.path.join(sdir, "backlinks.parquet")
            )
        # live OPIC cash accounts (opic adaptive priority)
        if d.get("cash") is not None and d["cash"].num_rows:
            pq.write_table(d["cash"], os.path.join(sdir, "cash.parquet"))
        # a salvaged partial round's unfetched remainder (SIGTERM
        # salvage): the resumed round re-takes exactly these rows
        if "resume_sel" in d:
            pq.write_table(
                d["resume_sel"], os.path.join(sdir, "resume_sel.parquet")
            )
    with open(os.path.join(tmp, "_lineage.json.tmp"), "w") as f:
        json.dump(
            {
                "round": round_no,
                "config_hash": config_hash,
                "n_shards": len(shards),
                "counts": counts,
                "metrics": metrics,
                **(
                    {"partial": True, "attempt": partial_attempt}
                    if partial_attempt is not None
                    else {}
                ),
            },
            f,
        )
    os.rename(
        os.path.join(tmp, "_lineage.json.tmp"), os.path.join(tmp, "_lineage.json")
    )
    # overwrite via rename-aside: the previous copy of this round stays
    # recoverable until the new one is fully in place (a crash between a
    # delete and the rename must never lose the round's only copy)
    old = final + ".old"
    if os.path.exists(final):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
    return final


def latest_complete_round(ckpt_dir: str) -> int | None:
    """Highest round number whose _lineage.json exists, else None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("round=") or "." in name:
            # skip round=N.tmp / round=N.old transients
            continue
        if os.path.exists(os.path.join(ckpt_dir, name, "_lineage.json")):
            r = int(name.split("=", 1)[1])
            best = r if best is None or r > best else best
    return best


def read_lineage(ckpt_dir: str, round_no: int) -> dict:
    with open(os.path.join(_round_dir(ckpt_dir, round_no), "_lineage.json")) as f:
        return json.load(f)


def partial_round(ckpt_dir: str) -> tuple[int, dict] | None:
    """Newest committed round=N.partial salvage, as (round, lineage);
    None when no salvage exists. Resume prefers a partial NEWER than
    the last complete round (the kill interrupted round N = last+1)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best: tuple[int, dict] | None = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("round=") or not name.endswith(".partial"):
            continue
        lpath = os.path.join(ckpt_dir, name, "_lineage.json")
        if not os.path.exists(lpath):
            continue
        r = int(name.split("=", 1)[1].split(".", 1)[0])
        if best is None or r > best[0]:
            with open(lpath) as f:
                best = (r, json.load(f))
    return best


def clear_partial(ckpt_dir: str, round_no: int) -> None:
    """Drop a salvage checkpoint once its round has completed for real."""
    shutil.rmtree(
        _round_dir(ckpt_dir, round_no) + ".partial", ignore_errors=True
    )


def load_checkpoint(
    ckpt_dir: str, round_no: int, shards: list, partial: bool = False
) -> None:
    """Restore every shard from a complete round's dump."""
    rdir = _round_dir(ckpt_dir, round_no) + (".partial" if partial else "")
    loads = []
    for i, shard in enumerate(shards):
        sdir = os.path.join(rdir, f"shard={i:04d}")
        tables = {
            name: pq.read_table(os.path.join(sdir, f"{name}.parquet"))
            for name in ("seen", "pending", "errored")
        }
        ht_path = os.path.join(sdir, "host_tokens.parquet")
        host_tokens = pq.read_table(ht_path) if os.path.exists(ht_path) else None
        rs_path = os.path.join(sdir, "resume_sel.parquet")
        resume_sel = pq.read_table(rs_path) if os.path.exists(rs_path) else None
        rt_path = os.path.join(sdir, "retries.parquet")
        retries = pq.read_table(rt_path) if os.path.exists(rt_path) else None
        bl_path = os.path.join(sdir, "backlinks.parquet")
        backlinks = pq.read_table(bl_path) if os.path.exists(bl_path) else None
        ca_path = os.path.join(sdir, "cash.parquet")
        cash = pq.read_table(ca_path) if os.path.exists(ca_path) else None
        loads.append(
            shard.load.remote(
                tables["seen"],
                tables["pending"],
                tables["errored"],
                host_tokens,
                resume_sel,
                retries,
                backlinks,
                cash,
            )
        )
    ray.get(loads)


def append_metrics(ckpt_dir: str, rows: list[dict]) -> None:
    """Per-round/partition throughput-and-lag metric rows (north_rule)."""
    os.makedirs(os.path.join(ckpt_dir, "metrics"), exist_ok=True)
    if not rows:
        return
    table = pa.Table.from_pylist(rows)
    path = os.path.join(
        ckpt_dir, "metrics", f"round={rows[0]['round']:06d}.parquet"
    )
    pq.write_table(table, path)
