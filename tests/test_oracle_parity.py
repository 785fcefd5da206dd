"""Every registry query with an oracle must hash-match DuckDB — the local
mirror of the driver's t2 gate, run at sf0.001 for speed (the driver uses
sf0.01; run `SPARK_GRAFT_SF_SMALL=/root/testdata/sf0.01 pytest` to match)."""

import pytest

from c4_5decisiontreebasedonmapreduce_spark import registry
from tests.oracle_utils import compare, duck_connection

ORACLES = registry.oracle_sql()
QUERIES = registry.queries()


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_small, duck, name):
    df = QUERIES[name](spark, sf_small)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
