"""S1, Spark-4-native form: the IMGT/HLA EMBL flat file as a registered
Python DataSource — `spark.read.format("imgt").load(path)`.

This is the second of the two scan strategies SURVEY §2.1 S1 names (the
first, `read_imgt_dat`, is text-scan + mapInPandas and shares the same
record parser). The DataSource form owns its partitioning: the driver
finds record-terminator-aligned byte ranges (reading only ~one block per
split boundary, not the file), and each task parses just its range — so
a multi-GB .dat file scans partition-parallel with zero shuffle and no
whole-file reads anywhere.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from gfe_db_spark.schemas import ALLELE_RECORD
from gfe_db_spark.sources.imgt import parse_embl_record

_TERM = b"\n//\n"
_DEFAULT_SPLIT = 8 * 1024 * 1024  # 8 MiB target split


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _record_aligned_splits(path: str, target: int) -> list[tuple[int, int]]:
    """Byte ranges [start, end) that begin/end exactly after a record
    terminator. Seeks near each target boundary and scans forward for the
    terminator — O(#splits) small reads on the driver."""
    size = os.path.getsize(path)
    if size <= target:
        return [(0, size)]
    cuts = [0]
    with open(path, "rb") as fh:
        pos = target
        while pos < size:
            fh.seek(pos)
            window = fh.read(1 << 20)  # records are ~kb; 1 MiB is generous
            idx = window.find(_TERM)
            if idx < 0:
                break  # tail has no further terminator: last split runs out
            cut = pos + idx + len(_TERM)
            if cut > cuts[-1]:
                cuts.append(cut)
            pos = cut + target
    cuts.append(size)
    return [(a, b) for a, b in zip(cuts, cuts[1:]) if b > a]


class IMGTDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("imgt datasource requires a path")
        self.split = int(options.get("splitsize", _DEFAULT_SPLIT))

    def partitions(self) -> list[InputPartition]:
        return [
            _Range(self.path, a, b)
            for a, b in _record_aligned_splits(self.path, self.split)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            chunk = fh.read(partition.end - partition.start)
        field_order = [f.name for f in ALLELE_RECORD.fields]
        for block in chunk.split(_TERM):
            text = block.decode("utf-8", errors="replace")
            if not text.strip():
                continue
            rec = parse_embl_record(text)
            if rec is None:
                continue
            rec["features"] = [
                (f["term"], f["rank"], f["sequence"]) for f in rec["features"]
            ]
            yield tuple(rec[k] for k in field_order)


class IMGTDataSource(DataSource):
    """`spark.dataSource.register(IMGTDataSource)` then
    `spark.read.format("imgt").load("/path/hla.3560.dat")`."""

    @classmethod
    def name(cls) -> str:
        return "imgt"

    def schema(self):
        return ALLELE_RECORD

    def reader(self, schema) -> DataSourceReader:
        return IMGTDataSourceReader(self.options)


def register(spark) -> None:
    """Idempotently register the `imgt` format on a session."""
    from gfe_db_spark.session import ship_package

    ship_package(spark)
    if not getattr(spark, "_imgt_ds_registered", False):
        spark.dataSource.register(IMGTDataSource)
        spark._imgt_ds_registered = True
