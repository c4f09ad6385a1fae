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
