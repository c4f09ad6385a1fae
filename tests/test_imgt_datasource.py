"""The `imgt` Python DataSource must return exactly what the mapInPandas
scan returns, and its byte-range splitter must never cut a record."""

from __future__ import annotations

import pytest

from gfe_db_spark.sources.imgt import read_imgt_dat
from gfe_db_spark.sources.imgt_datasource import (
    _record_aligned_splits,
    register,
)
from tests import gfe_fixtures as fx


@pytest.fixture(scope="module")
def dat_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgt_ds")
    return fx.write_release_dat(str(root), "3560")


def _canon(df):
    rows = df.collect()
    return sorted(
        (
            r["allele_id"],
            r["hla_name"],
            r["sequence"],
            tuple((f["term"], f["rank"], f["sequence"]) for f in (r["features"] or [])),
            r["cds_aa"],
        )
        for r in rows
    )


def test_datasource_matches_mapinpandas_scan(spark, dat_path):
    register(spark)
    via_ds = spark.read.format("imgt").load(dat_path)
    via_mip = read_imgt_dat(spark, dat_path)
    assert via_ds.schema == via_mip.schema
    assert _canon(via_ds) == _canon(via_mip)


def test_split_boundaries_respect_records(spark, dat_path):
    # force many tiny splits: records must survive unharmed
    register(spark)
    via_small = spark.read.format("imgt").option("splitsize", "200").load(dat_path)
    via_whole = spark.read.format("imgt").load(dat_path)
    assert _canon(via_small) == _canon(via_whole)
    assert via_small.rdd.getNumPartitions() > 1


def test_splitter_covers_file_exactly(dat_path):
    import os

    for target in (100, 1000, 10**9):
        splits = _record_aligned_splits(dat_path, target)
        assert splits[0][0] == 0
        assert splits[-1][1] == os.path.getsize(dat_path)
        for (a1, b1), (a2, b2) in zip(splits, splits[1:]):
            assert b1 == a2


def test_stream_datasource_incremental_exactly_once(spark, tmp_path):
    """The `imgt_stream` source must (1) emit each release exactly once
    across stream restarts from the same checkpoint (offsets name the
    processed releases), and (2) match the batch `imgt` scan row-for-row
    on each release it emits."""
    from gfe_db_spark.sources.imgt_stream import register as register_stream

    watch = tmp_path / "watch"
    watch.mkdir()
    fx.write_release_dat(str(watch), "3550")
    fx.write_release_dat(str(watch), "3560")

    register_stream(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("imgt_stream")
            .load(str(watch))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    by_rel = {r["release"]: r["n"] for r in got.groupBy("release").count().withColumnRenamed("count", "n").collect()}
    # 3550 predates the 3560 extra allele: 6 vs 7 records
    assert by_rel == {"3550": 6, "3560": 7}

    # a new release arrives; restart from the same checkpoint: ONLY the
    # new release is emitted (no duplicates of committed ones)
    fx.write_release_dat(str(watch), "3570")
    run_once()
    got = spark.read.parquet(sink)
    by_rel = {r["release"]: r["n"] for r in got.groupBy("release").count().withColumnRenamed("count", "n").collect()}
    assert by_rel == {"3550": 6, "3560": 7, "3570": 7}
    # no allele duplicated within any release
    assert got.select("release", "allele_id").distinct().count() == got.count()

    # row-level parity with the batch `imgt` format on one release
    register(spark)
    batch = spark.read.format("imgt").load(str(watch / "hla.3560.dat"))
    stream_rel = got.filter(got["release"] == "3560").drop("release")
    assert _canon(stream_rel) == _canon(batch)


def test_stream_reader_replay_of_missing_release_fails_loudly(tmp_path):
    """If a release file named by a checkpointed offset has been deleted,
    replay must raise (surfacing the data loss), never silently emit an
    empty batch — exactly-once recovery depends on release immutability."""
    from gfe_db_spark.sources.imgt_stream import IMGTStreamReader

    watch = tmp_path / "watch"
    watch.mkdir()
    r = IMGTStreamReader({"path": str(watch)})
    assert r.initialOffset() == {"releases": []}
    with pytest.raises(FileNotFoundError):
        list(r.readBetweenOffsets({"releases": []}, {"releases": ["9999"]}))
