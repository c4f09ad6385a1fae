"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal column plumbing.

These extend the reference's surface (SURVEY.md north-star extensions) and
are designed for 100 TB: shuffle-minimal shapes, broadcast-able dims,
banded LSH instead of all-pairs wherever a threshold allows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition a compact input up to full parallelism before a
    fan-out-heavy stage (explode blowup, Python UDF decode).

    Small files scan into fewer splits than cores, so the expensive
    downstream stage runs on a fraction of the machine; shuffling the
    compact input first is far cheaper. At cluster scale inputs already
    have ≥ parallelism splits and this is a no-op.

    Pass ``key`` (a high-cardinality column — every call site has a
    unique id) to spread by HASH partitioning instead of keyless
    round-robin. Keyless ``repartition(n)`` first locally SORTS its
    input so retried tasks reproduce the same row placement
    (spark.sql.execution.sortBeforeRepartition) — for wide payload rows
    (full document text, media bytes) that sort dominated the map side
    of the spread exchange (r13 stage audit: ~half the corpus-side cost
    of the shingle consumers). Hashing a unique id is deterministic
    under retries with no sort, and spreads evenly (ids ≫ partitions;
    guide §2.5).
    """
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        if key is not None:
            return df.repartition(sc.defaultParallelism, F.col(key))
        return df.repartition(sc.defaultParallelism)
    return df
