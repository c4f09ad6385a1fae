"""The read path (ref §3.3): validation queries A7-A9 and the documented
motif query surface, as plain Spark SQL over the graph tables."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfe_db_spark.plans.load import GraphTables
from gfe_db_spark.plans.motif import find


def node_counts(graph: GraphTables) -> DataFrame:
    """A7 (`execute_validation_queries/app.py:43-49`): count per node label."""
    parts = []
    for label, attr in [
        ("GFE", "nodes_gfe"),
        ("IPD_Accession", "nodes_ipd_accession"),
        ("IPD_Allele", "nodes_ipd_allele"),
        ("Sequence", "nodes_sequence"),
        ("Feature", "nodes_feature"),
        ("Submitter", "nodes_submitter"),
    ]:
        parts.append(
            getattr(graph, attr).agg(F.lit(label).alias("node"), F.count(F.lit(1)).alias("count"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("node")


def has_ipd_allele_release_counts(graph: GraphTables) -> DataFrame:
    """A8 (`execute_validation_queries/app.py:73-77`): UNWIND the distinct
    releases arrays on HAS_IPD_ALLELE → histogram ordered by release."""
    return (
        graph.edges_has_ipd_allele.select(
            F.explode(F.array_distinct("releases")).alias("release_version")
        )
        .groupBy("release_version")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("release_version")
    )


def ipd_accession_release_counts(graph: GraphTables) -> DataFrame:
    """A9 (`execute_validation_queries/app.py:79`): group-count on the
    HAS_IPD_ACCESSION release property."""
    return (
        graph.edges_has_ipd_accession.groupBy("release")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("release")
    )


def features_of_allele(graph: GraphTables, hla_name: str) -> DataFrame:
    """The documented query surface (`docs/source/reference.rst:92-96`):
    MATCH (:WHO {name})-[]-(:GFE)-[]-(f:Feature) RETURN f.term, f.rank
    ORDER BY term, rank — via the motif compiler (J8)."""
    motif = find(
        graph,
        "(w:IPD_Allele)<-[:HAS_IPD_ALLELE]-(g:GFE)-[:HAS_FEATURE]->(f:Feature)",
    )
    return (
        motif.filter(F.col("w_name") == hla_name)
        .select(F.col("f_term").alias("term"), F.col("f_rank").cast("int").alias("rank"))
        .orderBy("term", "rank")
    )
