"""Parquet table catalog for the driver's synthetic star schema.

Mirrors reference operator S5/S6 (schema-declared tabular sources,
`validate_build_output/app.py:87,165-198`) on the parquet substrate: every
read is schema-checked, columnar, and prunable by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ship_package(spark: SparkSession) -> None:
    """Re-export of session.ship_package: every `table()` call guarantees
    executors can import the package before any UDF-bearing plan runs."""
    from gfe_db_spark.session import ship_package as _ship

    _ship(spark)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain `spark.read.parquet` so Catalyst keeps
    predicate pushdown + column pruning (check via .explain: PushedFilters /
    ReadSchema).

    Timestamp encodings vary across driver testdata generations —
    TIMESTAMP(NANOS) (vectorized reader rejects it; read nanos-long and
    convert in the scan projection) and plain timestamp[us] (Spark 4 infers
    TIMESTAMP_NTZ, which `unix_millis`/interval arithmetic reject). Both are
    normalized here to session-zone TIMESTAMP; the session zone is pinned to
    UTC (session.py) so the NTZ cast is value-preserving.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ship_package(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return _normalize_timestamps(df)


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Rewrite nanos-long `ts` and any TIMESTAMP_NTZ column to TIMESTAMP."""
    from pyspark.sql import functions as F

    cols = []
    changed = False
    for fname, dtype in df.dtypes:
        if fname == "ts" and dtype == "bigint":
            # integer division: ts/1000 as double loses sub-µs precision at
            # ~1.7e18 ns (double ulp ≈ 0.25 µs there) → off-by-1-ms bugs
            cols.append(F.timestamp_micros(F.expr("ts div 1000")).alias("ts"))
            changed = True
        elif dtype == "timestamp_ntz":
            cols.append(F.col(fname).cast("timestamp").alias(fname))
            changed = True
        else:
            cols.append(F.col(fname))
    return df.select(*cols) if changed else df


#: (abs sf_dir, table) -> row count. The count on a raw parquet table is
#: footer-metadata cheap, but the adaptive-sizing queries call it at
#: CONSTRUCTION time (plan-contract tests, repeated bench invocations run
#: the same (sf_dir, table) many times per process), so memoize it. Raw
#: driver testdata is immutable within a session; anything derived or
#: mutable must go through `DataFrame.count()` directly.
_ROWCOUNT_CACHE: dict[tuple[str, str], int] = {}


def table_rowcount(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Cached row count of one raw parquet table (r8 advice: don't pay a
    Spark job per query-construction for a number that cannot change)."""
    key = (os.path.abspath(sf_dir), name)
    if key not in _ROWCOUNT_CACHE:
        _ROWCOUNT_CACHE[key] = table(spark, sf_dir, name).count()
    return _ROWCOUNT_CACHE[key]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries match the
    DuckDB oracle's pre-registered view names."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
