"""ST1/S1 streaming form: the IMGT/HLA release directory as a registered
Spark 4 STREAMING Python DataSource —
`spark.readStream.format("imgt_stream").load(dir)`.

The reference polls the upstream archive for new releases and kicks a
batch pipeline per release (ref `gfe-db/pipeline/functions/invoke_pipeline/app.py`,
trigger schedule in `pipeline/config.json`); this source expresses the
same watcher as a first-class Structured Streaming source with
exactly-once semantics:

- a micro-batch = the set of release files (`hla.<release>.dat`) not yet
  processed; the OFFSET names those releases, so recovery from the
  checkpoint replays exactly the releases of an interrupted batch
  (`readBetweenOffsets`) and never re-emits a committed one;
- release files are immutable once published (the reference's archive
  contract), which is what makes offset-named replay deterministic.

Scale note: this uses the simple (driver-read) stream reader because a
micro-batch is one release file (MBs — bounded by the upstream's own
release cadence), parsed with the same `parse_embl_record` the batch
scans use. Full-history backfills at partition parallelism go through
the batch `imgt` format (`imgt_datasource.py`), whose record-aligned
byte splits handle multi-GB files; the downstream incremental pipeline
(`streaming/incremental.py`) is identical either way.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from gfe_db_spark.schemas import ALLELE_RECORD
from gfe_db_spark.sources.imgt import parse_embl_record

_RELEASE_RE = re.compile(r"^hla\.([0-9]+)\.dat$")

# every allele row carries the release it arrived in — the incremental
# pipeline's join/watermark key
STREAM_ALLELE_RECORD = T.StructType(
    [T.StructField("release", T.StringType()), *ALLELE_RECORD.fields]
)


def _list_releases(path: str) -> list[str]:
    """Release ids present in the watched directory, numerically sorted
    (releases are monotonically numbered upstream)."""
    out = []
    for name in os.listdir(path):
        m = _RELEASE_RE.match(name)
        if m:
            out.append(m.group(1))
    return sorted(out, key=int)


def _parse_release(path: str, release: str) -> Iterator[tuple]:
    field_order = [f.name for f in ALLELE_RECORD.fields]
    with open(os.path.join(path, f"hla.{release}.dat"), "rb") as fh:
        data = fh.read()
    for block in data.split(b"\n//\n"):
        text = block.decode("utf-8", errors="replace")
        if not text.strip():
            continue
        rec = parse_embl_record(text)
        if rec is None:
            continue
        rec["features"] = [
            (f["term"], f["rank"], f["sequence"]) for f in rec["features"]
        ]
        yield (release, *(rec[k] for k in field_order))


class IMGTStreamReader(SimpleDataSourceStreamReader):
    """Offsets are the processed-release set: `{"releases": [...]}`.

    `read` emits every not-yet-processed release and advances the offset;
    `readBetweenOffsets` re-parses exactly the releases the interrupted
    batch named (files are immutable, so the replay is bit-identical);
    `commit` is a no-op — all state lives in the engine's checkpointed
    offsets, none in this reader."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("imgt_stream datasource requires a directory path")

    def initialOffset(self) -> dict:
        return {"releases": []}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        seen = set(start.get("releases", []))
        new = [r for r in _list_releases(self.path) if r not in seen]
        end = {"releases": sorted(seen | set(new), key=int)}
        # materialized, not a generator: the engine pickles the prefetched
        # rows into its replay cache (a micro-batch is one bounded release)
        rows = [row for rel in new for row in _parse_release(self.path, rel)]
        return rows, end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = set(start.get("releases", []))
        for rel in sorted(set(end.get("releases", [])) - seen, key=int):
            yield from _parse_release(self.path, rel)

    def commit(self, end: dict) -> None:
        pass


class IMGTStreamDataSource(DataSource):
    """`spark.dataSource.register(IMGTStreamDataSource)` then
    `spark.readStream.format("imgt_stream").load("/watch/dir")`."""

    @classmethod
    def name(cls) -> str:
        return "imgt_stream"

    def schema(self):
        return STREAM_ALLELE_RECORD

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return IMGTStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the `imgt_stream` format on a session.

    Unlike batch Python DataSources (whose planner/worker processes pick
    up `addPyFile` artifacts — how the sibling `imgt` format ships), the
    STREAMING source runner is a driver-side Python process that does not
    get the pyFiles path, so a driver started outside the repo (spark-
    submit elsewhere, the round driver's cwd) would hit
    ModuleNotFoundError unpickling the reader. Registering this module
    and its two imports for pickle-BY-VALUE makes the registered source
    self-contained: the runner needs no importable `gfe_db_spark` at all.
    """
    from gfe_db_spark.session import ship_package

    ship_package(spark)
    if not getattr(spark, "_imgt_stream_ds_registered", False):
        # MUST be pyspark's vendored cloudpickle — that's the instance the
        # DataSource registration serializes with; the standalone package
        # keeps a separate by-value registry and the hint would be ignored
        from pyspark import cloudpickle

        import gfe_db_spark.schemas
        import gfe_db_spark.sources.imgt
        import gfe_db_spark.sources.imgt_stream

        for mod in (
            gfe_db_spark.sources.imgt_stream,
            gfe_db_spark.sources.imgt,
            gfe_db_spark.schemas,
        ):
            cloudpickle.register_pickle_by_value(mod)
        spark.dataSource.register(IMGTStreamDataSource)
        spark._imgt_stream_ds_registered = True
