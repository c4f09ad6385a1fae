"""Sequence packing for training-data preparation: assign documents to
fixed-token-budget packs (the concat-and-chunk step that turns a corpus
into equal-length training examples).

Exact greedy bin packing is inherently sequential, so the distributed
form shards the corpus first (deterministic hash shard) and packs
contiguously WITHIN each shard: a per-shard window cumsum places every
document at a token offset, and its pack is the chunk containing that
offset. Chunk boundaries may split a document across two packs — the
`crosses_boundary` flag marks those, matching how concat-and-chunk
loaders treat boundary tokens.

Scale: the only shuffle is the window's hash partition on `shard`;
parallelism = n_shards, so size n_shards to the cluster (a config knob,
default 32). No global ordering, no driver iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gfe_db_spark.operators.text import hash_bucket_10k, tokenize

DEFAULT_PACK_TOKENS = 512
DEFAULT_SHARDS = 32


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = DEFAULT_PACK_TOKENS,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a (shard, pack_id) under a `max_tokens` chunk
    budget. Deterministic: shard is the engine-portable md5 gate (the same
    one deterministic_split uses), order within a shard is `id_col`."""
    toks = F.filter(tokenize(F.col(text_col)), lambda t: t != "")
    base = docs.select(
        F.col(id_col),
        (hash_bucket_10k(id_col, "pack") % n_shards).alias("shard"),
        F.size(toks).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    # exact integer division (`div`) over the named offsets, not
    # floor(double /): global token offsets past 2^53 would round under
    # double arithmetic and misassign packs at corpus scale
    mid = base.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).cast("long").alias("__start"),
        (cum - 1).cast("long").alias("__last"),
    )
    first_chunk = F.expr(f"__start div {int(max_tokens)}")
    return mid.select(
        id_col,
        "shard",
        "n_tokens",
        first_chunk.alias("pack_id"),
        # last token index = cum - 1; a doc crosses iff its last token's
        # chunk differs from its first token's (empty docs never cross)
        (
            (F.col("n_tokens") > 0)
            & (F.expr(f"__last div {int(max_tokens)}") > first_chunk)
        ).alias("crosses_boundary"),
    )


def pack_fill_stats(packed: DataFrame, max_tokens: int = DEFAULT_PACK_TOKENS) -> DataFrame:
    """Per-(shard, pack) fill telemetry from `pack_sequences` output —
    the feedback signal for tuning max_tokens vs document length mix."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_started"),
        )
        .withColumn(
            "fill_ratio_started",
            F.round(F.col("tokens_started") / F.lit(float(max_tokens)), 6),
        )
    )


def shard_by_token_budget(
    docs: DataFrame,
    budget: int = 2048,
    bucket_span: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to output shards by a GLOBAL token budget in
    `id_col` order — the writer-side step that cuts a corpus into
    training files of ~`budget` tokens each while preserving corpus
    order (pack_sequences is the hash-sharded cousin that gives up
    global order for embarrassing parallelism).

    The global running sum is a two-phase distributed prefix sum, never
    a single-partition window over the corpus: (1) bucket rows by id
    range and cumsum WITHIN each bucket (parallel window, keyed
    shuffle); (2) aggregate one total per bucket and turn those into
    exclusive bucket offsets with a window over the tiny bucket table
    (#rows = #buckets — bounded metadata, like the IVF centroid or BPE
    vocab tables); (3) broadcast-join the offsets back. A document's
    shard is the budget-chunk containing its first token.

    Assumes ids are roughly uniform over their range so id-range buckets
    are balanced; for skewed id spaces, substitute a range-partitioner
    sample for the fixed `bucket_span` — the two-phase shape is unchanged.
    """
    toks = F.filter(tokenize(F.col(text_col)), lambda t: t != "")
    base = docs.select(
        F.col(id_col),
        # exact integer division (`div`), not floor(double /): long / long
        # in Spark is double arithmetic, so ids past 2^53 would round and
        # misbucket at corpus scale
        F.expr(f"`{id_col}` div {int(bucket_span)}").alias("__bucket"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w_intra = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0).cast("long"))
    totals = base.groupBy("__bucket").agg(F.sum("n_tokens").alias("__total"))
    w_bucket = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(w_bucket), F.lit(0).cast("long")).alias(
            "__offset"
        ),
    )
    return (
        base.join(F.broadcast(offsets), "__bucket")
        .withColumn("start_offset", intra + F.col("__offset"))
        .select(
            id_col,
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset div {int(budget)}").alias("shard"),
        )
    )
