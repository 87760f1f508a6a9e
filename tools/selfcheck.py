"""Self-check harness mirroring the driver's correctness gate: run each
queries() entry AND its oracle_sql() on the same sf_dir, compare
row-count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted by all columns, values stringified).

Usage:
    python tools/selfcheck.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.12g").encode()
    return hashlib.md5(payload).hexdigest()


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(
            f"columns ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
        )
        return problems
    a, b = canonical(ray_df), canonical(sql_df)
    if value_hash(a) != value_hash(b):
        problems.append("value hash mismatch")
        if len(a) == len(b):
            for c in a.columns:
                ac, bc = a[c], b[c]
                try:
                    if ac.dtype.kind == "f":
                        import numpy as np

                        if not np.allclose(ac, bc, rtol=1e-9, equal_nan=True):
                            problems.append(f"  col {c} differs (float)")
                    elif not ac.equals(bc):
                        problems.append(f"  col {c} differs")
                except Exception as e:  # noqa: BLE001
                    problems.append(f"  col {c} compare error: {e}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--oracled",
        action="store_true",
        help="run every query that HAS an oracle (the full exact gate)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.oracled:
        names = [n for n in queries if n in oracles] + (args.names or [])
    else:
        names = args.names or list(queries)
    n_fail = 0
    for name in names:
        fn = queries[name]
        try:
            ray_df = to_pandas(fn(args.sf))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} (rows-only, no oracle)")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK   {name}: rows={len(ray_df)} hash match")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
