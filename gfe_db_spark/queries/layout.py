"""Data-layout query inventory (north-star extension): Z-order clustering
extents and deterministic corpus shuffle — the storage-layout levers of a
100 TB pipeline (file skipping and reproducible training order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gfe_db_spark.operators import layout as LAY
from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table

_ZBITS = 10
_ZSHIFT = 12


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_partkey, l_suppkey) and report per-Z-bucket
    row counts and min/max extents of both dimensions — the file-level
    stats a Z-ordered write produces, i.e. exactly what lets a scan on
    EITHER column skip files. The bit-interleave is a pure-builtin narrow
    map; the only shuffle is the final bucket aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return LAY.zorder_extent_stats(
        li, "l_partkey", "l_suppkey", bits=_ZBITS, bucket_shift=_ZSHIFT
    )


_ZEXPR = LAY.morton_interleave_sql(
    f"(l_partkey & {(1 << _ZBITS) - 1})", f"(l_suppkey & {(1 << _ZBITS) - 1})", _ZBITS
)

ZORDER_SQL = f"""
WITH z AS (
  SELECT ({_ZEXPR}) >> {_ZSHIFT} AS z_bucket,
         l_partkey & {(1 << _ZBITS) - 1} AS x,
         l_suppkey & {(1 << _ZBITS) - 1} AS y
  FROM lineitem
)
SELECT z_bucket, COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY z_bucket ORDER BY z_bucket
"""


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random training order over `documents`:
    16-way md5 hash shard + intra-shard rank. The window is keyed by
    shard, so the plan is one shuffle on shard + per-shard sort — no
    global row numbering anywhere."""
    docs = table(spark, sf_dir, "documents")
    return LAY.shuffle_order(docs, id_col="doc_id", seed=42, shard_nibbles=1).orderBy(
        "shard", "pos"
    )


CORPUS_SHUFFLE_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':' || '42') AS shuffle_key
  FROM documents
)
SELECT doc_id,
       substr(shuffle_key, 1, 1) AS shard,
       CAST(row_number() OVER (
         PARTITION BY substr(shuffle_key, 1, 1)
         ORDER BY shuffle_key, doc_id
       ) AS INT) AS pos,
       shuffle_key
FROM keyed
ORDER BY shard, pos
"""


QUERIES: dict[str, QuerySpec] = {
    "zorder_layout": QuerySpec(
        zorder_layout,
        ZORDER_SQL,
        "Z-order (Morton) clustering extents for two-column file skipping",
    ),
    "corpus_shuffle": QuerySpec(
        corpus_shuffle,
        CORPUS_SHUFFLE_SQL,
        "deterministic hash-sharded corpus shuffle order",
    ),
}
