"""Data-layout operators: Z-order (Morton) clustering and deterministic
corpus shuffling.

At 100 TB the dominant query cost is the scan, and the scan cost is set by
the LAYOUT of the data on disk, not the query plan: parquet/Delta file
skipping prunes a file when the predicate falls outside the file's
column min/max stats. Sorting on one column gives skipping on that column
only; Z-ordering interleaves the bits of two columns so files stay narrow
in BOTH dimensions and either predicate prunes (the Delta/Iceberg
`OPTIMIZE ZORDER BY` primitive, re-expressed as plain Spark: compute the
Morton code, `repartitionByRange` on it, sort within partitions, write).

Deterministic corpus shuffle is the training-data counterpart: a training
run needs the corpus in a reproducible pseudo-random order. The scalable
form is never a global row_number — it is hash-sharding plus an
intra-shard sort, so the order is (shard, pos_in_shard) with every
shard computed independently (a keyed window, no single-partition sort).

All expressions are JVM builtins — narrow maps plus one keyed window /
ranged write; nothing leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (Z-order) code: interleave the low `bits` bits of two
    non-negative ints — z = … y1 x1 y0 x0. Unrolled into a chain of
    shift/and/or builtins so the whole expression stays inside
    whole-stage codegen (no UDF). 2*bits must fit in a long."""
    z: Column = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton_interleave_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical Morton code as portable SQL (DuckDB/ANSI bit ops),
    for oracle parity and for engines that push the layout job down."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_extent_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    bucket_shift: int = 12,
) -> DataFrame:
    """Z-order the frame on (x, y) and report, per Z-range bucket (the
    file-boundary stand-in: at scale each bucket is one output file from
    `repartitionByRange(zval)`), the row count and the min/max extent of
    both dimensions. Narrow extents in both columns are exactly what makes
    file skipping work — this is the measurable artifact of the layout.

    Plan: narrow map (bit ops) → single hash aggregate on the bucket id.
    The write path (`zorder_write`) does the actual ranged clustering."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    mask = (1 << bits) - 1
    zv = morton_interleave(x.bitwiseAND(F.lit(mask)), y.bitwiseAND(F.lit(mask)), bits)
    return (
        df.select(
            F.shiftright(zv, bucket_shift).alias("z_bucket"),
            x.bitwiseAND(F.lit(mask)).alias("x"),
            y.bitwiseAND(F.lit(mask)).alias("y"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("z_bucket")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 8,
) -> None:
    """The actual layout job: cluster rows by Morton code and write, so
    downstream scans skip files on either column's min/max stats.
    `repartitionByRange` is a sampled range partitioner — the one extra
    shuffle this job exists to pay — and the within-partition sort keeps
    each file internally ordered for page-level stats too."""
    mask = (1 << bits) - 1
    zv = morton_interleave(
        F.col(x_col).cast("long").bitwiseAND(F.lit(mask)),
        F.col(y_col).cast("long").bitwiseAND(F.lit(mask)),
        bits,
    )
    (
        df.withColumn("_zval", zv)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    shard_nibbles: int = 1,
) -> DataFrame:
    """Deterministic pseudo-random corpus order for training runs:
    shard = first `shard_nibbles` hex chars of md5(id:seed) (16^n-way —
    size the shard count so one shard ≈ one training file),
    pos = rank within the shard by the full md5 key. Every
    shard is independent, so the window is keyed — the plan is a narrow
    map → one shuffle on shard → per-shard sort. Reading shards
    round-robin reproduces the same global order on any engine (md5 is
    engine-portable, unlike xxhash64 — same portability choice as the
    MinHash kit in operators/dedup.py)."""
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            F.substring(key, 1, shard_nibbles).alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select(id_col, "shard", "pos", "shuffle_key")
    )
