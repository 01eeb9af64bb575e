"""The single branch-sharing pin point (r16; r15 VERDICT items 1-2).

etl_sample_spark/pinning.py is where the localCheckpoint-vs-persist
trade is decided ONCE for all ~25 scan-audit pins. These tests pin the
contract: every mode materializes (same results, branch-shared), the
guard bypass really is the identity, and the bypass is LIVE — i.e. the
registry-wide plan guards in test_plans.py genuinely see through the
pins they run under.
"""

from __future__ import annotations

import pytest

from etl_sample_spark.pinning import pin


def _mk(spark):
    from pyspark.sql import functions as F

    return spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    ).groupBy("k").agg(F.sum("v").alias("s"))


def test_no_pin_is_identity(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_PIN", "1")
    df = _mk(spark)
    assert pin(df) is df


def test_checkpoint_mode_truncates_lineage(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    df = pin(_mk(spark))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan, plan
    assert df.count() == 7


def test_persist_mode_keeps_lineage_and_caches(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "persist")
    df = pin(_mk(spark))
    try:
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # lineage kept: the aggregate is still in the logical plan
        assert "LogicalRDD" not in plan, plan
        df.count()
        ex = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in ex, ex
    finally:
        df.unpersist()


def test_reliable_mode_checkpoints_to_dir(spark, monkeypatch, tmp_path):
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = pin(_mk(spark), eager=True)
    assert df.count() == 7
    # the reliable checkpoint really wrote to the configured dir
    assert any((tmp_path / "ckpt").rglob("*")), "no checkpoint files written"


def test_unknown_mode_raises(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "zram")
    with pytest.raises(ValueError, match="zram"):
        pin(_mk(spark))


def test_all_modes_agree_on_a_pinned_registry_query(spark, sf_dir, monkeypatch):
    """Same rows out of a real multi-branch pinned query in every mode
    (including the guard bypass) — the pin is a materialization hint,
    never a semantics change."""
    from etl_sample_spark.plans import REGISTRY

    spec = REGISTRY["chi2_event_type_by_user_band"]
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    want = sorted(map(str, spec.spark(spark, sf_dir).collect()))
    for env in ({"SPARK_GRAFT_NO_PIN": "1"}, {"SPARK_GRAFT_PIN_MODE": "persist"}):
        monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
        monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        got = sorted(map(str, spec.spark(spark, sf_dir).collect()))
        assert got == want, env
    spark.catalog.clearCache()


def test_guard_bypass_is_live(spark, sf_dir, monkeypatch):
    """Guard the guards: the pin-free build must actually reopen the
    pinned subtrees. simhash_cluster_assign's default final plan
    contains ZERO parquet scans (everything upstream is inside its two
    pins — that is exactly the blindness r15's VERDICT flagged); with
    SPARK_GRAFT_NO_PIN=1 the corpus scans must be visible again, else
    test_no_python_row_udfs_anywhere / test_no_corpus_global_windows
    are running on the same opaque plans they always were."""
    from etl_sample_spark.plans import REGISTRY

    spec = REGISTRY["simhash_cluster_assign"]
    monkeypatch.delenv("SPARK_GRAFT_NO_PIN", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    pinned = spec.spark(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" not in pinned or "parquet" not in pinned, (
        "default plan unexpectedly shows the corpus scan — pin gone?"
    )
    monkeypatch.setenv("SPARK_GRAFT_NO_PIN", "1")
    free = spec.spark(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" in free, "pin-free plan still hides the corpus scan"
