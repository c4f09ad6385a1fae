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

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as nanos-long and convert to a
    microsecond timestamp inside the scan projection (stays distributed,
    truncation matches DuckDB's ms/µs flooring for positive epochs).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ship_package(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ts/1000 as double loses sub-µs precision at
            # ~1.7e18 ns (double ulp ≈ 0.25 µs there) → off-by-1-ms bugs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries match the
    DuckDB oracle's pre-registered view names."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
