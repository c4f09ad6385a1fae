"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark_fn, oracle_sql) pair.

Each module contributes a ``QUERIES: dict[str, QuerySpec]``. The driver
contract (`__spark_entry__.py`) flattens these into ``queries()`` /
``oracle_sql()``. Oracle SQL is ANSI SQL runnable by DuckDB over the same
parquet tables; queries whose semantics aren't SQL-expressible set
``sql=None`` and get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One named query: the Spark implementation and its DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only check
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    """Aggregate every module's QUERIES. Import here (not module top-level)
    so a syntax error in one module is attributable."""
    from gfe_db_spark.queries import (
        dedup,
        graph,
        multimodal,
        relational,
        similarity,
        streaming,
        text,
        tpch_plus,
        tpch_rest,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch_plus,
        tpch_rest,
        graph,
        dedup,
        similarity,
        text,
        multimodal,
        streaming,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
