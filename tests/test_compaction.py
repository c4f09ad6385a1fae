"""Small-file compaction: content preservation, partition-layout
preservation, idempotent re-runs, and crash recovery at both interruption
points of the swap protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfe_db_spark.plans.compaction import (
    CompactionStats,
    compact_small_files,
    file_stats,
    recover_compaction,
)
from gfe_db_spark.plans.merge import fs_exists, fs_write_text


def _write_fragmented(spark, path, n_rows=2000, n_files=40):
    df = spark.range(n_rows).withColumn("v", F.col("id") * 2)
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_preserves_content_and_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _write_fragmented(spark, path)
    before = file_stats(spark, path).count()
    assert before >= 30
    stats = compact_small_files(spark, path, target_bytes=10 * 1024 * 1024)
    assert isinstance(stats, CompactionStats)
    assert not stats.skipped
    assert stats.files_before == before
    assert stats.files_after < before
    assert stats.rows == 2000
    got = spark.read.parquet(path)
    assert got.count() == 2000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compaction_skips_already_compact_target(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    stats = compact_small_files(spark, path)
    assert stats.skipped and stats.files_before == stats.files_after == 1


def test_compaction_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3000).withColumn("part", (F.col("id") % 3).cast("int"))
    df.repartition(30).write.partitionBy("part").mode("overwrite").parquet(path)
    stats = compact_small_files(
        spark, path, target_bytes=10 * 1024 * 1024, partition_by=["part"]
    )
    assert stats.files_after < stats.files_before
    got = spark.read.parquet(path)
    assert got.count() == 3000
    # partition pruning must survive: directory layout intact
    one = spark.read.parquet(path).filter("part = 1")
    assert one.count() == 1000
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "part#" in plan


def test_recover_promotes_completed_staging(spark, tmp_path):
    # crash between delete(target) and rename(staging): target missing,
    # staging complete (marker present) → promote
    path = str(tmp_path / "t")
    _write_fragmented(spark, path, n_rows=500, n_files=5)
    staging = path + ".compacting"
    spark.read.parquet(path).coalesce(1).write.parquet(staging)
    fs_write_text(spark, staging + "/_COMPACTION_COMPLETE", "ok")
    from gfe_db_spark.plans.merge import fs_delete

    fs_delete(spark, path)
    assert recover_compaction(spark, path) == "promoted"
    assert spark.read.parquet(path).count() == 500
    assert not fs_exists(spark, staging)


def test_recover_discards_partial_staging(spark, tmp_path):
    # crash during the staged write: target intact, staging has no marker
    # → staging torn down, target untouched, rerun converges
    path = str(tmp_path / "t")
    _write_fragmented(spark, path, n_rows=500, n_files=5)
    staging = path + ".compacting"
    spark.read.parquet(path).limit(10).coalesce(1).write.parquet(staging)
    assert recover_compaction(spark, path) == "discarded"
    assert not fs_exists(spark, staging)
    stats = compact_small_files(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats.rows == 500


def test_recover_refuses_partial_staging_without_target(spark, tmp_path):
    # the impossible-under-protocol state: never silently destroy the only
    # copy of the data
    path = str(tmp_path / "t")
    staging = path + ".compacting"
    spark.range(10).write.parquet(staging)
    from gfe_db_spark.plans.merge import hadoop_fs

    fs, _ = hadoop_fs(spark, staging + "/_SUCCESS")
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    fs.delete(HPath(staging + "/_SUCCESS"), False)
    with pytest.raises(RuntimeError, match="manual recovery"):
        recover_compaction(spark, path)
