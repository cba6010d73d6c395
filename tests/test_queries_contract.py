"""Driver-contract test: every catalog query matches its DuckDB oracle
at sf0.001 (row count + column names + order-insensitive values), and
__spark_entry__ exposes a coherent contract."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_queries import TABLES, canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from scrapeulous_spark.operators import load_all_catalogs

    return load_all_catalogs()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_all_queries_match_oracle(spark, registry, duck):
    failures = []
    for name, q in sorted(registry.items()):
        sdf = q.spark(spark, SF_DIR).toPandas()
        if q.oracle is None:
            assert len(sdf) >= 0
            continue
        ddf = duck.sql(q.oracle).df()
        s, d = canon(sdf), canon(ddf)
        if s != d:
            failures.append(name)
    assert not failures, f"oracle mismatches: {failures}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs), "every oracle key must have a query"
    assert len(qs) >= 40
    # engine-native crawl views are hash-checked against the
    # MATERIALIZED serial oracle (plans/oracle_export.py)
    for name in ("loop_frontier_dfs", "dedup_url_seen_engine", "udaf_social_extract"):
        assert name in qs and name in oracles and "read_parquet" in oracles[name]
    # since the expected-value sidecars (sources/corpus.py), EVERY
    # query has an oracle — the binary-codec outputs twin against
    # generator-side expected parquet instead of staying rows-only
    assert set(qs) == set(oracles)

    df = E.entry(spark)
    assert df.count() > 0
    assert {"seed_id", "step", "url", "depth"} <= set(df.columns)
