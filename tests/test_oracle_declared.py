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


def test_engine_forms_match_spec_sql(spark, sf_dir):
    """Engine-form overrides (dq13-precedent rewrites that need Python,
    e.g. dq33's BLAS path) must return byte-identical rows to the spec
    SQL the oracle runs — float fold order and HALF_UP rounding included."""
    from etl_rust_spark.catalog import register_views
    from etl_rust_spark.functions.hashing import canonical_hash
    from etl_rust_spark.queries.engine_forms import ENGINE_FORMS

    register_views(spark, sf_dir)
    for name, fn in ENGINE_FORMS.items():
        spec_df = spark.sql(DECLARED[name].spark_sql)
        eng_df = fn(spark, sf_dir)
        cols = list(spec_df.columns)
        assert list(eng_df.columns) == cols, name
        h_spec = canonical_hash([tuple(r) for r in spec_df.collect()], cols)
        h_eng = canonical_hash([tuple(r) for r in eng_df.collect()], cols)
        assert h_spec == h_eng, f"{name} engine form diverged from spec SQL"


def test_dq04_avg_price_is_double(spark, sf_dir):
    """Regression (VERDICT r2 #1): Spark must return avg_price as DOUBLE,
    not DECIMAL(24,2) — identical values hash differently under the
    driver's type-aware canonicalization.  The Spark form casts the SUM
    to DOUBLE before dividing so both engines do IEEE double division."""
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    df = spark.sql(DECLARED["dq04"].spark_sql)
    dtype = dict(df.dtypes)["avg_price"]
    assert dtype == "double", f"avg_price must be double, got {dtype}"


def test_decimal_float_canonicalization_discriminates():
    """Regression: the local canonicalizer must distinguish Decimal from
    float even when values are numerically equal (r2 dq04 class)."""
    from decimal import Decimal

    from etl_rust_spark.functions.hashing import canonical_hash

    h_dec = canonical_hash([(Decimal("52771.00"),)], ["v"])
    h_flt = canonical_hash([(52771.0,)], ["v"])
    assert h_dec != h_flt


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    # every oracle key must have a runner; runners without oracle are the
    # documented weaker rows-only checks.
    assert set(osql) <= set(qs)
