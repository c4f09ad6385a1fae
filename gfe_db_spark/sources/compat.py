"""Compatibility sources/sinks matching the reference's file surface
(SURVEY.md §2.1 S4-S8).

The engine's canonical store is Parquet; these exist so a user of the
reference can keep producing/consuming the exact artifacts the reference's
pipeline exchanges: per-release header-first CSV extracts
(ref `app.py:179-206` S4), schema-declared and all-string CSV reads
(ref `load.cyp` LOAD CSV S5, `validate_build_output/app.py:87` S6),
the NDJSON error ledger (ref `app.py:671-681` S7), and an object-store
style listing source (ref `validate_build_output/app.py:205-212` S8).

Scale: CSV writes repartition to a bounded file count (CSV is an export
format here, not the analytic store); reads carry declared schemas so
Catalyst still prunes columns even though CSV can't push predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfe_db_spark import schemas

# the five extracts and their contracts (ref validate_build_output/app.py:165-198)
EXTRACT_SCHEMAS: dict[str, T.StructType] = {
    "gfe_sequences": schemas.GFE_SEQUENCES,
    "all_features": schemas.ALL_FEATURES,
    "all_groups": schemas.ALL_GROUPS,
    "all_cds": schemas.ALL_CDS,
    "all_alignments": schemas.ALL_ALIGNMENTS,
}


def write_csv_extract(df: DataFrame, out_dir: str, name: str, release: str,
                      max_files: int = 1) -> str:
    """S4: write one `<name>.<release>.csv` extract directory with header,
    every column as string (the reference's untyped-CSV contract)."""
    path = os.path.join(out_dir, f"{name}.{release}.csv")
    as_str = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    as_str.repartition(max_files).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    return path


def read_csv_extract(spark: SparkSession, path: str, name: str) -> DataFrame:
    """S5: header CSV read under the declared StructType contract."""
    schema = EXTRACT_SCHEMAS[name]
    return spark.read.option("header", True).schema(schema).csv(path)


def read_csv_all_string(spark: SparkSession, path: str) -> DataFrame:
    """S6: validation-style read — schema inference disabled, every column
    StringType (ref Polars `infer_schema_length=0`)."""
    first = spark.read.option("header", True).csv(path)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in first.columns])
    return spark.read.option("header", True).schema(schema).csv(path)


def write_error_ndjson(errors: DataFrame, out_dir: str, release: str,
                       max_errors: int = 10) -> tuple[str, int]:
    """S7 + A11: the NDJSON error ledger with the reference's error cap
    (ref app.py:596 `max_errors=10`, 671-681). Returns (path, n_errors);
    callers treat n_errors > max_errors as the exit-code-1 condition."""
    path = os.path.join(out_dir, f"errors.{release}.ndjson")
    n = errors.limit(max_errors + 1).count()
    errors.repartition(1).write.mode("overwrite").json(path)
    return path, n


def list_artifacts(spark: SparkSession, prefix: str) -> DataFrame:
    """S8: object-store-style listing → (filename, size, created_utc).
    Uses the Hadoop FileSystem API so the same code lists s3a:// or
    hdfs:// prefixes on a cluster."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(prefix)
    fs = fs_path.getFileSystem(conf)
    rows = []
    if fs.exists(fs_path):
        for status in fs.listStatus(fs_path):
            rows.append(
                (
                    status.getPath().getName(),
                    int(status.getLen()),
                    int(status.getModificationTime()),
                )
            )
    schema = "filename string, size long, modified_ms long"
    return spark.createDataFrame(rows, schema)


def validate_artifacts(spark: SparkSession, out_dir: str, release: str) -> DataFrame:
    """F8/A10/J10 composition: per-extract checks — artifact exists,
    filename matches `^<name>.<release>.csv$`, header set equals the
    contract, rowcount > 0 (ref validate_build_output/app.py:99-117)."""
    listing = {r["filename"] for r in list_artifacts(spark, out_dir).collect()}
    results = []
    for name, schema in EXTRACT_SCHEMAS.items():
        fname = f"{name}.{release}.csv"
        exists = fname in listing
        headers_ok = False
        nonempty = False
        if exists:
            df = read_csv_all_string(spark, os.path.join(out_dir, fname))
            headers_ok = set(df.columns) == {f.name for f in schema.fields}
            nonempty = bool(df.head(1))
        results.append((fname, exists, headers_ok, nonempty,
                        exists and headers_ok and nonempty))
    return spark.createDataFrame(
        results,
        "filename string, file_exists boolean, headers_ok boolean, "
        "nonempty boolean, is_valid_csv boolean",
    )
