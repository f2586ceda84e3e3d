"""The local t2 gate: every oracle-backed catalog query must match DuckDB
exactly at sf0.001 (driver runs the same comparison at sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import assert_frames_match, run_oracle


def _oracle_queries():
    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_queries())
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(sql, sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]
    assert len(rows) >= 0


def test_rows_only_queries_run(spark, sf_dir):
    oracled = set(entrymod.oracle_sql())
    for name, q in entrymod.queries().items():
        if name in oracled:
            continue
        df = q(spark, sf_dir)
        assert df.count() >= 0, name
