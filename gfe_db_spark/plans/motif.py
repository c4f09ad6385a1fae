"""J8: graph motif queries as join compositions.

The reference's query surface is Cypher `MATCH` patterns
(`docs/source/reference.rst:92-96`). GraphFrames isn't available in this
environment, so this is a small motif→join compiler in its `find` style:

    find(g, "(a:GFE)-[:HAS_FEATURE]->(f:Feature)")

compiles to the edge table joined to both node tables, output columns
prefixed by the pattern variables (`a_name`, `f_term`, …). Chained hops
share variables:

    find(g, "(w:IPD_Allele)<-[:HAS_IPD_ALLELE]-(g1:GFE)-[:HAS_FEATURE]->(f:Feature)")

Each hop is one equi-join on node keys — Catalyst plans the join order;
label filtering prunes node scans before the joins (the custom rule the
survey flagged is unnecessary because node tables are already per-label).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfe_db_spark.plans.load import GraphTables

# node label → (table attr, key columns used by edges pointing at it)
_NODE_TABLE = {
    "GFE": "nodes_gfe",
    "Sequence": "nodes_sequence",
    "Feature": "nodes_feature",
    "IPD_Allele": "nodes_ipd_allele",
    "IPD_Accession": "nodes_ipd_accession",
    "Submitter": "nodes_submitter",
}

# edge type → (table attr, src node label, dst node label, dst join spec)
# dst join spec: "name" for name-keyed nodes, or the composite feature key.
_EDGE_TABLE = {
    "HAS_IPD_ALLELE": ("edges_has_ipd_allele", "GFE", "IPD_Allele", "name"),
    "HAS_IPD_ACCESSION": ("edges_has_ipd_accession", "GFE", "IPD_Accession", "name"),
    "SUBMITTED": ("edges_submitted", "Submitter", "GFE", "name"),
    "HAS_SEQUENCE": ("edges_has_sequence", "GFE", "Sequence", "name"),
    "HAS_FEATURE": ("edges_has_feature", "GFE", "Feature", "feature_key"),
}

_HOP = re.compile(
    r"\((\w+):(\w+)\)\s*(<-|-)\[:(\w+)\]\s*(->|-)\s*(?=\((\w+):(\w+)\))"
)


def _prefixed(df: DataFrame, var: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{var}_{c}") for c in df.columns])


def find(graph: GraphTables, pattern: str) -> DataFrame:
    """Compile a motif pattern to joins. Supports chains of hops
    `(v:Label)-[:TYPE]->(v2:Label2)` with `<-` for reversed direction;
    repeated variables unify."""
    hops = []
    for m in _HOP.finditer(pattern):
        lvar, llab, larrow, etype, rarrow, rvar, rlab = m.groups()
        reversed_ = larrow == "<-"
        hops.append((lvar, llab, etype, rvar, rlab, reversed_))
    if not hops:
        raise ValueError(f"no hops parsed from pattern: {pattern!r}")

    result: DataFrame | None = None
    bound: set[str] = set()

    for lvar, llab, etype, rvar, rlab, reversed_ in hops:
        table_attr, src_lab, dst_lab, dst_key = _EDGE_TABLE[etype]
        edges = getattr(graph, table_attr)
        # pattern-direction: (l)-[:T]->(r) means l=src,r=dst; '<-' swaps
        src_var, dst_var = (rvar, lvar) if reversed_ else (lvar, rvar)
        src_node = _prefixed(getattr(graph, _NODE_TABLE[src_lab]), src_var)
        dst_node = _prefixed(getattr(graph, _NODE_TABLE[dst_lab]), dst_var)

        hop_df = edges
        # join src node on name key
        hop_df = hop_df.join(
            src_node, hop_df.src == src_node[f"{src_var}_name"], "inner"
        )
        if dst_key == "name":
            hop_df = hop_df.join(
                dst_node, hop_df.dst == dst_node[f"{dst_var}_name"], "inner"
            ).drop("src", "dst")
        else:  # composite feature key
            cond = (
                (hop_df.dst_locus == dst_node[f"{dst_var}_locus"])
                & (hop_df.dst_rank == dst_node[f"{dst_var}_rank"])
                & (hop_df.dst_term == dst_node[f"{dst_var}_term"])
                & (hop_df.dst_accession == dst_node[f"{dst_var}_accession"])
            )
            hop_df = hop_df.join(dst_node, cond, "inner").drop(
                "src", "dst_locus", "dst_rank", "dst_term", "dst_accession"
            )

        if result is None:
            result = hop_df
            bound |= {src_var, dst_var}
        else:
            shared = [v for v in (src_var, dst_var) if v in bound]
            if not shared:
                result = result.crossJoin(hop_df)
            else:
                # unify on the shared variable's columns present in both
                join_cols = [
                    c
                    for c in hop_df.columns
                    if c in result.columns and c.split("_", 1)[0] in shared
                ]
                # avoid duplicate non-join columns
                dup = [c for c in hop_df.columns if c in result.columns and c not in join_cols]
                hop_df = hop_df.drop(*dup)
                result = result.join(hop_df, on=join_cols, how="inner")
            bound |= {src_var, dst_var}

    return result
