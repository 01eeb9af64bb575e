"""CBO statistics: ANALYZE must surface real row counts / column NDVs
to Catalyst so cost-based decisions (broadcast choice, join order) run
on data, not file-size guesses."""

from __future__ import annotations

import pytest

from etl_sample_spark import catalog


@pytest.fixture(scope="module")
def analyzed_nation(spark, sf_dir):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS managed_nation")
    shutil.rmtree(f"{warehouse}/managed_nation", ignore_errors=True)
    t = catalog.save_as_managed(spark, sf_dir, "nation")
    catalog.analyze(spark, t, columns=["n_nationkey", "n_name"])
    yield t
    spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_row_count_reaches_optimizer(spark, sf_dir, analyzed_nation):
    stats = spark.table(analyzed_nation)._jdf.queryExecution().optimizedPlan().stats()
    assert stats.rowCount().isDefined()
    assert stats.rowCount().get() == 25


def test_analyze_column_ndv(spark, analyzed_nation):
    desc = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(f"DESCRIBE EXTENDED {analyzed_nation} n_nationkey").collect()
    }
    assert desc.get("distinct_count") == "25"
    assert desc.get("num_nulls") == "0"
