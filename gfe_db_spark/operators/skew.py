"""Skew-mitigation utilities for extreme-key joins and aggregations.

AQE's skew-join handling (on by default in `session.py`) splits oversized
shuffle partitions at runtime and covers most cases. These helpers are for
the cases AQE can't fix: a sort-merge join where ONE key holds 10% of a
100 TB fact table still funnels that key's rows through single tasks on
both sides. Salting rewrites the join so the hot key spreads over N
subkeys — at the cost of replicating the (small) build side N times.

All salts are deterministic (xxhash64 of the full row, not rand()), so
retries and speculative tasks stay consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total for the heaviest
    keys — run this before deciding to salt. One aggregation pass."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"), key)
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting.

    The big (probe) side gets a deterministic salt in [0, salt) derived
    from a hash of the whole row; the small (build) side is exploded
    `salt`-fold so every (key, salt) pair finds its match. The shuffle then
    distributes each hot key over `salt` partitions instead of one.

    Semantics are identical to `big.join(small, on, how)` for inner/left
    joins keyed on `on`. Right/full joins would double-count unmatched
    build rows across salt replicas and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("__salt", salt_col.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(df: DataFrame, group_key: str, distinct_key: str,
                          salt: int = 16) -> DataFrame:
    """Two-phase distinct count for skewed groups: partial distinct within
    (group, salt) shards, then merge — the shuffle never sees one giant
    group. Exact (not approx): phase 1 dedups (group, value) pairs."""
    shard = F.pmod(F.xxhash64(F.col(distinct_key)), F.lit(salt)).cast("int")
    partial = (
        df.select(group_key, distinct_key)
        .withColumn("__salt", shard)
        .groupBy(group_key, "__salt")
        .agg(F.count_distinct(F.col(distinct_key)).alias("partial_n"))
    )
    # hash-sharding by the distinct value makes shards disjoint, so the
    # per-shard distinct counts sum exactly
    return (
        partial.groupBy(group_key)
        .agg(F.sum("partial_n").cast("long").alias("n_distinct"))
    )
