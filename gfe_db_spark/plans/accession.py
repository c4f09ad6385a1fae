"""W6: the accession registry — stable dictionary-encoding of feature
sequences.

The GFE paper's core invariant (`docs/source/reference.rst:79-84`): every
distinct feature sequence within a `(locus, term, rank)` context gets a
small integer accession that is a *permanent reversible 1-to-1 mapping*.
The reference outsources this to a REST feature service per allele
(ref app.py:531-536) — a per-row network call. The engine internalizes it
as a persistent registry table plus a deterministic assignment step, the
single biggest build-time performance win over the reference.

Assignment must be:
  - stable across runs (registry is persistent, append-only);
  - deterministic within a batch (new sequences ordered by
    (first_release, sequence) before numbering — parallel runs converge);
  - serialized per commit (ST6: one writer; the driver-side orchestrator
    guarantees commit order across releases).

Durability (r7): the registry commits through the manifest-pointer
SEGMENT LOG (`plans/txtable.txlog_append`) by default — each commit
writes one immutable segment dir and atomically publishes a manifest, so
a reader polling DURING an append or a compaction always resolves one
complete snapshot. This retires the registry's old rename-swap +
`.compacting` marker protocol as the default (the one production-stateful
table whose reader isolation rested on ST6 discipline alone — round-6
verdict missing #1); the old protocol remains available as
``layout="inplace"`` for existing registries.

Scale: the registry is keyed by (locus, term, rank, sequence); joins hash
on those keys. At 100 TB the new-sequence side is small relative to the
corpus (vocabulary growth is sublinear), and max-accession-per-context is
a tiny aggregate; the expensive join (features ⨝ registry) is a plain
equi-join Catalyst can shuffle-hash on the composite key. Long histories
stay O(compact_files): segments fold via `txlog_compact` once `max_files`
accumulate, and the post-compaction vacuum bounds manifest count too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gfe_db_spark.schemas import ACCESSION_REGISTRY

_KEY = ["locus", "term", "rank"]
_IDENT = [*_KEY, "sequence"]


class AccessionRegistry:
    """Persistent (parquet-backed) accession registry with deterministic
    first-seen numbering.

    ``layout="tx"`` (default): each commit appends one immutable segment
    through the manifest-pointer log (reader-isolated; see module
    docstring). After `max_files` segments the log is folded into
    `compact_files` parts by `txlog_compact` and old manifests/segments
    are vacuumed, so a long release history keeps O(compact_files) data
    files and a bounded manifest count — not O(commits) of either.

    ``layout="inplace"``: the legacy flat parquet dir with rename-promote
    appends and a `.compacting`-marker compaction swap. Kept as the
    documented opt-out for registries created before r7; its swap window
    is only safe under strict ST6 single-writer/single-reader discipline.

    The layout is auto-guarded like `plans/load.upsert_graph`: committing
    with the wrong layout against an existing registry raises instead of
    silently splitting the data across two protocols."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        max_files: int = 16,
        compact_files: int = 4,
        layout: str = "tx",
    ):
        if layout not in ("tx", "inplace"):
            raise ValueError(f"unknown registry layout {layout!r}")
        self.spark = spark
        self.path = path
        self.max_files = max_files
        self.compact_files = compact_files
        self.layout = layout

    # --- layout guard ----------------------------------------------------

    def _detect_layout(self) -> str | None:
        """Layout of the on-disk registry: 'tx' if a manifest dir exists,
        'inplace' if top-level parquet parts exist, None if absent."""
        fs, HPath = self._fs()
        if fs.exists(HPath(os.path.join(self.path, "_manifests"))):
            return "tx"
        if fs.exists(HPath(self.path)):
            for s in fs.listStatus(HPath(self.path)):
                if s.getPath().getName().endswith(".parquet"):
                    return "inplace"
        if fs.exists(HPath(self.path + ".compacting")):
            return "inplace"  # interrupted legacy compaction
        return None

    def _check_layout(self) -> None:
        found = self._detect_layout()
        if found is not None and found != self.layout:
            raise ValueError(
                f"registry at {self.path} uses the {found!r} layout; "
                f"pass layout={found!r} — a {self.layout!r} commit would "
                "hide or split the accumulated mapping"
            )

    # --- public API -------------------------------------------------------

    def load(self) -> DataFrame:
        """Current registry frame. Sets ``self._loaded_empty``: True iff
        the storage layer STATICALLY knows there is no registry yet (no
        manifest / no directory) — i.e. the returned frame is a zero-row
        local relation, not a scan that might be empty."""
        self._check_layout()
        if self.layout == "tx":
            from gfe_db_spark.plans.txtable import txlog_read

            df = txlog_read(self.spark, self.path)
            if df is not None:
                self._loaded_empty = False
                return df
            self._loaded_empty = True
            return self.spark.createDataFrame([], schema=ACCESSION_REGISTRY)
        self._recover()
        fs, HPath = self._fs()
        if fs.exists(HPath(self.path)):  # Hadoop FS: works for hdfs/s3a too
            self._loaded_empty = False
            return self.spark.read.parquet(self.path)
        self._loaded_empty = True
        return self.spark.createDataFrame([], schema=ACCESSION_REGISTRY)

    def assign(self, features: DataFrame, release: str) -> DataFrame:
        """Return `features` with an `accession` column; new sequences get
        the next integers per (locus, term, rank) and are persisted.

        `features` must have columns locus, term, rank (int), sequence.
        """
        registry = self.load()

        # Deterministic numbering: order new (= not yet registered)
        # sequences lexicographically within their context, offset by the
        # current max accession. Bootstrap (no registry yet — statically
        # known from load()): every distinct feature is new, so skip the
        # anti-join and max-accession join instead of planning sort-merge
        # joins against a zero-row relation — the `numbered` plan below is
        # materialized through persist(), whose cache-fill runs the
        # INITIAL (non-AQE-reoptimized) plan, i.e. two full exchange+sort
        # legs of overhead per commit that AQE would have elided at
        # runtime (r13 stage audit: the fixture-build entries paid 2 of
        # their 3 heavy stages exactly here; guide §2.4).
        w = W.partitionBy(*_KEY).orderBy("sequence")
        if self._loaded_empty:
            # One exchange, not two: hash-partitioning on the coarser
            # _KEY satisfies BOTH the distinct's clustering requirement
            # (equal _IDENT rows are equal on _KEY, so they co-locate)
            # and the window's exact partitioning, so the distinct
            # aggregate and row_number share the same shuffle.
            numbered = (
                features.select(*_IDENT)
                .repartition(*_KEY)
                .distinct()
                .withColumn("row_rank", F.row_number().over(w))
                .withColumn("max_acc", F.lit(None).cast("int"))
            )
        else:
            distinct_feats = features.select(*_IDENT).distinct()
            new_feats = distinct_feats.join(registry, on=_IDENT, how="left_anti")
            # max_acc is one row per (locus, term, rank) — a bounded
            # domain (loci × feature terms × ranks), orders of magnitude
            # below the registry itself at any corpus scale — so
            # broadcast it instead of letting the cached initial plan
            # pick a sort-merge join.
            max_acc = registry.groupBy(*_KEY).agg(F.max("accession").alias("max_acc"))
            numbered = new_feats.withColumn("row_rank", F.row_number().over(w)).join(
                F.broadcast(max_acc), on=_KEY, how="left"
            )
        numbered = (
            numbered.withColumn(
                "accession",
                (F.coalesce(F.col("max_acc"), F.lit(0)) + F.col("row_rank")).cast("int"),
            )
            .withColumn("first_release", F.lit(release))
            .select(*_IDENT, "accession", "first_release")
        )

        # Append-only commit (serialized by the caller, ST6). New-vocabulary
        # batches are small (sublinear in corpus size), so one part file per
        # commit: a commit adds O(1) files and compaction only triggers
        # after ~max_files commits. A batch with NO new sequences (a replayed
        # release, ST3) commits nothing at all — the replay is a true no-op
        # instead of an empty segment + manifest bump.
        numbered = numbered.persist()
        try:
            has_new = bool(numbered.head(1))
            if self.layout == "tx":
                from gfe_db_spark.plans.txtable import txlog_append

                if has_new:
                    txlog_append(numbered, self.path, n_files=1)
            elif has_new:
                # legacy: stage to a tmp dir so the write never reads the
                # directory it appends to, then promote the staged part
                # files by rename (atomic-per-file on HDFS-like FSes).
                tmp = self.path + ".tmp"
                numbered.repartition(self.compact_files).write.mode(
                    "overwrite"
                ).parquet(tmp)
                self._promote(tmp)
        finally:
            numbered.unpersist()
        self._compact_if_needed()

        # No broadcast hint: the registry grows with the corpus vocabulary;
        # let Catalyst/AQE pick broadcast vs shuffle-hash by actual size.
        registry = self.load()
        return features.join(registry.select(*_IDENT, "accession"), on=_IDENT, how="left")

    # --- compaction -------------------------------------------------------

    def _compact_if_needed(self) -> None:
        if self.layout == "tx":
            from gfe_db_spark.plans.txtable import (
                tx_vacuum,
                txlog_compact,
                txlog_segment_count,
            )

            if txlog_segment_count(self.spark, self.path) > self.max_files:
                txlog_compact(self.spark, self.path, n_files=self.compact_files)
                # bound manifest count too: retain the last 2 snapshots
                # (the standard reader-grace contract); superseded
                # segments are provably published → no grace needed
                tx_vacuum(self.spark, self.path, keep_manifests=2)
            return
        self._compact_inplace_if_needed()

    def _compact_inplace_if_needed(self) -> None:
        """Rewrite the registry into `compact_files` parts once `max_files`
        part files have accumulated. Contents are unchanged (pure file-
        layout rewrite); the swap is rename-based with a `.compacting`
        recovery marker, so a crash at any point leaves a loadable
        registry (see `_recover`). Runs under the caller's commit
        serialization (ST6), so no concurrent reader sees the swap."""
        fs, HPath = self._fs()
        dst = HPath(self.path)
        if not fs.exists(dst):
            return
        parts = [
            s for s in fs.listStatus(dst) if s.getPath().getName().endswith(".parquet")
        ]
        if len(parts) <= self.max_files:
            return
        compacting = self.path + ".compacting"
        (
            self.spark.read.parquet(self.path)
            .repartition(self.compact_files)
            .write.mode("overwrite")
            .parquet(compacting)
        )
        # Own completion marker, written only after the staged write
        # returned: clusters can disable the committer's _SUCCESS marker
        # (mapreduce.fileoutputcommitter.marksuccessfuljobs=false), and
        # recovery must not depend on committer configuration.
        from gfe_db_spark.plans.merge import fs_write_text

        fs_write_text(self.spark, compacting + "/_COMPACTION_COMPLETE", "ok")
        fs.delete(dst, True)
        fs.rename(HPath(compacting), dst)
        # the marker has served its purpose; drop it so the registry dir
        # holds only parquet parts (plus any committer bookkeeping)
        fs.delete(HPath(self.path + "/_COMPACTION_COMPLETE"), False)

    def _recover(self) -> None:
        """Finish an interrupted legacy compaction: if the registry dir is
        gone but a fully-written `.compacting` dir exists (crash between
        delete and rename in `_compact_inplace_if_needed`), promote it."""
        fs, HPath = self._fs()
        compacting = HPath(self.path + ".compacting")
        if not fs.exists(HPath(self.path)) and fs.exists(compacting):
            complete = fs.exists(HPath(self.path + ".compacting/_COMPACTION_COMPLETE"))
            # legacy staged dirs predate the explicit marker; their
            # committer _SUCCESS is an acceptable completion witness
            complete = complete or fs.exists(HPath(self.path + ".compacting/_SUCCESS"))
            if complete:
                fs.rename(compacting, HPath(self.path))
                marker = HPath(self.path + "/_COMPACTION_COMPLETE")
                if fs.exists(marker):
                    fs.delete(marker, False)
            else:
                # can't occur under the protocol (delete runs only after a
                # successful staged write) — never destroy data silently
                raise RuntimeError(
                    f"registry {self.path} missing and {self.path}.compacting "
                    "is partial; manual recovery required"
                )

    def _fs(self):
        from gfe_db_spark.plans.merge import hadoop_fs

        fs, _ = hadoop_fs(self.spark, self.path)
        return fs, self.spark._jvm.org.apache.hadoop.fs.Path

    def _promote(self, tmp: str) -> None:
        """Move staged part files into the registry dir via the Hadoop
        FileSystem API (works for file://, hdfs://, s3a:// alike). Part
        names carry a per-write UUID, so renames cannot collide."""
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        src = HPath(tmp)
        fs = src.getFileSystem(conf)
        dst = HPath(self.path)
        fs.mkdirs(dst)
        for status in fs.listStatus(src):
            name = status.getPath().getName()
            if name.endswith(".parquet") and status.getLen() > 0:
                fs.rename(status.getPath(), HPath(dst, name))
        fs.delete(src, True)
