"""Source-format completeness: CSV with quarantine, ORC round-trip with
pushdown, parquet schema evolution (sources/formats.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_sample_spark import catalog
from etl_sample_spark.sources.formats import (
    read_csv_quarantined,
    read_orc,
    read_parquet_evolved,
    write_orc,
)

CSV_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,name,amount\n")
        f.write("1,alice,10.5\n")
        f.write("2,bob,20.0\n")
        f.write("3,carol,NOT_A_NUMBER\n")  # uncastable -> quarantine
        f.write("4,dave,40.25\n")
    good, quarantine, raw = read_csv_quarantined(spark, p, CSV_SCHEMA)
    assert {r["id"] for r in good.collect()} == {1, 2, 4}
    bad = quarantine.collect()
    assert len(bad) == 1
    # the raw line is preserved for replay/debugging
    assert "NOT_A_NUMBER" in bad[0]["_corrupt_record"]
    # totals reconcile: nothing silently dropped
    assert good.count() + quarantine.count() == 4
    # the schema passed in is NOT mutated (StructType.add pitfall) —
    # a second call with the same object must behave identically
    assert [f.name for f in CSV_SCHEMA.fields] == ["id", "name", "amount"]
    good2, quarantine2, raw2 = read_csv_quarantined(spark, p, CSV_SCHEMA)
    assert good2.count() == 3 and quarantine2.count() == 1
    raw.unpersist()
    raw2.unpersist()


def test_csv_roundtrip_matches_parquet_source(spark, sf_dir, tmp_path):
    """orders -> CSV -> schema'd read-back equals the parquet original
    (timestamps via ISO strings; money survives as double text)."""
    orders = catalog.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    p = str(tmp_path / "orders_csv")
    orders.write.option("header", True).mode("overwrite").csv(p)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    back, quarantine, raw = read_csv_quarantined(spark, p, schema)
    assert quarantine.count() == 0
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    raw.unpersist()


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    li = catalog.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = str(tmp_path / "li_orc")
    write_orc(li, p)
    back = read_orc(spark, p)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_quantity")).collect() == li.agg(
        F.sum("l_quantity")
    ).collect()
    # filter + projection reach the ORC scan (same contract as parquet)
    plan = (
        back.where(F.col("l_partkey") == 7)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_partkey" in plan.split("PushedFilters")[1][:120]


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """v1 files lack the column v2 adds; mergeSchema reads both vintages
    as one frame with nulls for the old files — append-only evolution,
    no rewrite."""
    base = str(tmp_path / "tbl")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    v1.write.mode("overwrite").parquet(os.path.join(base, "batch=1"))
    v2 = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.9)], ["id", "name", "score"]
    )
    v2.write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    merged = read_parquet_evolved(
        spark, os.path.join(base, "batch=1"), os.path.join(base, "batch=2")
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 0.5
    assert len(rows) == 4


def test_schema_contract_reports_every_violation(spark):
    from pyspark.sql.types import DoubleType, LongType, StringType

    from etl_sample_spark.sources.formats import (
        SchemaContractError,
        validate_schema_contract,
    )

    contract = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    ok = spark.createDataFrame([(1, "a", 0.5)], schema=contract)
    validate_schema_contract(ok, contract)  # no raise
    # column order must not matter
    validate_schema_contract(ok.select("score", "id", "name"), contract)

    import pytest as _pytest

    bad = spark.createDataFrame([(1, 2, "x")], ["id", "name", "extra"])
    with _pytest.raises(SchemaContractError) as e:
        validate_schema_contract(bad, contract)
    msg = str(e.value)
    assert "missing: ['score']" in msg
    assert "unexpected: ['extra']" in msg
    assert "name: expected string, got bigint" in msg


def test_erase_rows_by_key_rewrites_without_the_keys(spark, sf_dir, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F  # noqa: F811

    from etl_sample_spark.sources.sinks import erase_rows_by_key

    path = str(tmp_path / "events_tbl")
    ev = catalog.table(spark, sf_dir, "events")
    ev.write.parquet(path)
    n_total = ev.count()
    victims = ev.select("user_id").distinct().limit(3)
    victim_ids = {r["user_id"] for r in victims.collect()}
    n_victim_rows = ev.where(F.col("user_id").isin(victim_ids)).count()

    before, after = erase_rows_by_key(spark, path, "user_id", victims)
    assert (before, after) == (n_total, n_total - n_victim_rows)
    back = spark.read.parquet(path)
    assert back.count() == after
    assert back.where(F.col("user_id").isin(victim_ids)).count() == 0
    # no stranded temp/old directories
    assert not glob.glob(path + "__*")
    assert os.path.isdir(path)
