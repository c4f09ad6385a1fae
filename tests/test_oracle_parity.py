"""Side-by-side Spark vs DuckDB oracle parity for every registered query —
the local mirror of the driver's CORRECTNESS gate (at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from gfe_db_spark.queries import all_queries
from gfe_db_spark.testing import compare, duckdb_connection
from tests.conftest import SF_SMOKE

_SPECS = {name: spec for name, spec in all_queries().items()}


@pytest.fixture(scope="module")
def oracle_con():
    return duckdb_connection(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(spark, oracle_con, name):
    spec = _SPECS[name]
    spark_df = spec.fn(spark, SF_SMOKE)
    if spec.sql is None:
        # rows-only check, like the driver's weaker path
        assert spark_df.count() >= 0
        return
    oracle_df = oracle_con.execute(spec.sql).fetchdf()
    result = compare(name, spark_df, oracle_df)
    assert result.ok, str(result)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
