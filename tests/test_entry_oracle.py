"""Driver-contract conformance: every queries() entry runs, and every
oracle_sql() entry matches the Spark result exactly (row multiset +
column names), mirroring the driver's DuckDB comparison at small sf."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows(itr):
    return sorted(tuple(_norm(v) for v in row) for row in itr)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_against_oracle(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, sf_dir)
    spark_rows = _rows(tuple(r) for r in df.collect())
    assert len(spark_rows) > 0, f"{name}: empty result"
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return  # rows-only contract
    res = ddb.sql(sql)
    oracle_rows = _rows(res.fetchall())
    assert [c.lower() for c in df.columns] == \
        [c.lower() for c in res.columns], f"{name}: column names differ"
    assert len(spark_rows) == len(oracle_rows), \
        f"{name}: {len(spark_rows)} vs {len(oracle_rows)} rows"
    mismatches = [(a, b) for a, b in zip(spark_rows, oracle_rows) if a != b]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_pip_variants_agree(spark, sf_dir):
    qs = entry_mod.queries()
    a = _rows(tuple(r) for r in qs["pip_broadcast"](spark, sf_dir).collect())
    b = _rows(tuple(r) for r in qs["pip_salted"](spark, sf_dir).collect())
    assert a == b
