"""Differential test: every declared query hash-matches the DuckDB oracle.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to reproduce the driver's t2 gate scale.
"""

from __future__ import annotations

import pytest

from etl_rust_spark.queries import DECLARED
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(DECLARED))
def test_declared_query_matches_oracle(spark, duck, sf_dir, name):
    q = DECLARED[name]
    res = compare(spark, duck, sf_dir, q.spark_sql, q.oracle_sql)
    assert res["match"], f"{name} diverged from oracle: {res}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    # every oracle key must have a runner; runners without oracle are the
    # documented weaker rows-only checks.
    assert set(osql) <= set(qs)
