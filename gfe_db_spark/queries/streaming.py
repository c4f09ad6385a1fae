"""streaming query inventory — populated as operators land."""

from __future__ import annotations

from gfe_db_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
