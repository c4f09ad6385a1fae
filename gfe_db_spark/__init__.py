"""gfe_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nmdp-bioinformatics/gfe-db.

Built Spark-first: DataFrames with declared schemas, Catalyst-planned joins
and aggregations, partition-parallel parsers, and node/edge DataFrames with
motif-as-join queries in place of a graph database. See SURVEY.md for the
structural analysis this implements.
"""

__version__ = "0.1.0"

from gfe_db_spark.session import get_spark  # noqa: F401
