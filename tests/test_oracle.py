"""DuckDB-oracle gate as a test: every declared query must hash-match its
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import compare_one, duck_connect

QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connect(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, sf_smoke, name):
    ok, issues = compare_one(spark, duck, name, QS[name], ORACLES[name], sf_smoke)
    assert ok, issues


@pytest.mark.parametrize("name", sorted(set(QS) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_smoke, name):
    assert QS[name](spark, sf_smoke).count() >= 0


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 10
