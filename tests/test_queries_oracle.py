"""Run the driver-style correctness compare (queries vs DuckDB oracle)
for the whole catalog at sf0.001 — the in-repo mirror of
CORRECTNESS_r{N}.json."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.selfcheck import TABLES, compare, to_pandas  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog(ray_session):
    import __ray_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _names():
    from louis_crawler_legacy_ray.pipelines.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, catalog, con):
    queries, oracles = catalog
    ray_df = to_pandas(queries[name](SF))
    sql_df = con.sql(oracles[name]).df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems
    assert len(ray_df) > 0, "oracled query must produce rows"


def test_rows_only_queries_produce_rows(catalog):
    queries, oracles = catalog
    for name, fn in queries.items():
        if name in oracles:
            continue
        df = to_pandas(fn(SF))
        assert len(df) > 0, name
