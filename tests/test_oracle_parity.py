"""Oracle-differential tests: every registry query vs its DuckDB SQL,
exactly as the driver's CORRECTNESS gate does (BASELINE.md t2)."""

import os

import pytest

from mxene_coin_cell_data_pipeline_spark.plans import QUERIES

from oracle_harness import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

_ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
_ROWSONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.spark(spark, SF_DIR)
    res = compare(df, duck, spec.oracle)
    assert res["match"], f"{name}: {res['detail']} (rows {res['rows_spark']} vs {res['rows_oracle']})"


@pytest.mark.parametrize("name", _ROWSONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
