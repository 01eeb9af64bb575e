"""Differential test: every registered query vs its DuckDB oracle — the
local twin of the driver's t2 correctness gate (row count + schema +
order-insensitive values), run at sf0.001 for speed.

Queries registered without an oracle (approximate LSH ops) get a
rows-materialize smoke check here; their quality is asserted separately
in test_similarity.py / test_dedup.py.
"""

from __future__ import annotations

import pytest

from etl_sample_spark.plans import REGISTRY
from tests.conftest import assert_driver_canonicalizable, assert_matches_oracle

ORACLE_QUERIES = sorted(name for name, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    # Same contract the driver checks: runs, stable schema, >= 0 rows —
    # plus the pandas-canonicalizability contract every driver row needs.
    assert df.columns
    rows = assert_driver_canonicalizable(df)
    assert len(rows) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30, "operator coverage regression"
