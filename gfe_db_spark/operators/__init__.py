"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal column plumbing.

These extend the reference's surface (SURVEY.md north-star extensions) and
are designed for 100 TB: shuffle-minimal shapes, broadcast-able dims,
banded LSH instead of all-pairs wherever a threshold allows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition a compact input up to full parallelism before a
    fan-out-heavy stage (explode blowup, Python UDF decode).

    Small files scan into fewer splits than cores, so the expensive
    downstream stage runs on a fraction of the machine; shuffling the
    compact input first is far cheaper. At cluster scale inputs already
    have ≥ parallelism splits and this is a no-op.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
