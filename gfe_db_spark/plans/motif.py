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

# Older schema labels used throughout the reference's documented query
# surface (`docs/source/reference.rst:20` — "the WHO and IMGT_HLA nodes";
# the doc's example queries write `(:WHO {name})`). Both are prior names
# for today's IPD_Allele node, so the doc's literal query text keeps
# working against this engine.
LABEL_ALIASES = {
    "WHO": "IPD_Allele",
    "IMGT_HLA": "IPD_Allele",
}


def _resolve_label(label: str) -> str:
    label = LABEL_ALIASES.get(label, label)
    if label not in _NODE_TABLE:
        raise ValueError(f"unknown node label: {label!r}")
    return label

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
        llab, rlab = _resolve_label(llab), _resolve_label(rlab)
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


# --- mini-Cypher front end -------------------------------------------------
# Enough MATCH/RETURN/ORDER BY to run the reference docs' literal query
# text (`docs/source/reference.rst:36`):
#
#     MATCH (:WHO {name:'HLA-A*01:03:01:01'})-[]-(:GFE)-[]-(f:Feature)
#     RETURN f.term, f.rank ORDER BY f.term, f.rank
#
# i.e. anonymous nodes, `{key:'value'}` property filters, untyped
# undirected edges (the edge type is inferred from the endpoint label
# pair — unambiguous in this schema), label aliases, and dotted RETURN /
# ORDER BY projections. Output columns are named `<var>_<prop>`
# (anonymous variables get `anonN` — no leading underscore: `find`
# recovers the variable from a column name by splitting on the first
# `_`, so a leading underscore would break unification).

_CY_NODE = re.compile(r"\(\s*(\w+)?\s*(?::(\w+))?\s*(\{[^}]*\})?\s*\)")
_CY_EDGE = re.compile(r"\s*(<-|-)\s*\[\s*(?::(\w+))?\s*\]\s*(->|-)\s*")
_CY_PROP = re.compile(r"(\w+)\s*:\s*'([^']*)'")
_CY_QUERY = re.compile(
    r"^\s*MATCH\s+(?P<pattern>.+?)\s*"
    r"RETURN\s+(?P<ret>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _infer_edge_type(llab: str, rlab: str) -> tuple[str, bool]:
    """Untyped edge `-[]-`: resolve the single edge type connecting the
    two endpoint labels (reversed_=True when the stored direction is
    rlab→llab). Ambiguity is a loud error — the schema currently has at
    most one edge type per label pair."""
    cands = []
    for etype, (_t, src, dst, _k) in _EDGE_TABLE.items():
        if (src, dst) == (llab, rlab):
            cands.append((etype, False))
        if (src, dst) == (rlab, llab):
            cands.append((etype, True))
    if len(cands) != 1:
        raise ValueError(
            f"cannot infer edge type between {llab} and {rlab}: "
            f"candidates {[c[0] for c in cands]}"
        )
    return cands[0]


def run_cypher(graph: GraphTables, query: str) -> DataFrame:
    """Execute a doc-style Cypher query (the subset above) against the
    graph tables by normalizing it into `find`'s typed pattern form, then
    applying property filters, RETURN projection, and ORDER BY."""
    m = _CY_QUERY.match(query)
    if not m:
        raise ValueError(f"unsupported query shape: {query!r}")
    pattern, ret, order = m.group("pattern"), m.group("ret"), m.group("order")

    # tokenize: node (edge node)*
    pos = 0
    nodes: list[tuple[str, str, dict[str, str]]] = []  # (var, label, props)
    edges: list[tuple[str | None, bool | None]] = []  # (etype, reversed_) per gap
    used_vars = {v for v, _l, _p in _CY_NODE.findall(pattern) if v}
    anon = 0
    nm = _CY_NODE.match(pattern, pos)
    if not nm:
        raise ValueError(f"pattern must start with a node: {pattern!r}")
    while True:
        var, label, props_src = nm.groups()
        if label is None:
            raise ValueError(f"nodes need a label in this subset: {pattern!r}")
        if var is None:
            while f"anon{anon}" in used_vars:
                anon += 1
            var, anon = f"anon{anon}", anon + 1
        props = dict(_CY_PROP.findall(props_src)) if props_src else {}
        nodes.append((var, _resolve_label(label), props))
        pos = nm.end()
        if pos >= len(pattern) or not pattern[pos:].strip():
            break
        em = _CY_EDGE.match(pattern, pos)
        if not em:
            raise ValueError(f"expected an edge at …{pattern[pos:]!r}")
        larrow, etype, rarrow = em.groups()
        if larrow == "<-" and rarrow == "->":
            raise ValueError(f"edge has two arrowheads: {pattern!r}")
        # reversed_ is None ⇔ the user asserted NO direction (both plain
        # '-'), typed or not — Cypher's undirected edge matches either
        # orientation, so only an actual arrowhead can contradict the
        # stored direction (typed-undirected `-[:T]-` previously read as
        # an asserted forward arrow and falsely emptied one spelling)
        reversed_ = None if larrow == "-" and rarrow == "-" else (larrow == "<-")
        edges.append((etype, reversed_))
        pos = em.end()
        nm = _CY_NODE.match(pattern, pos)
        if not nm:
            raise ValueError(f"expected a node at …{pattern[pos:]!r}")

    # normalize into find()'s typed form. A user arrow that CONTRADICTS
    # the schema's stored direction for the resolved edge type (e.g.
    # `(:GFE)<-[]-(:Feature)` when the store holds GFE→Feature) is valid
    # Cypher that simply matches nothing — compile the hop in the stored
    # direction for a correct schema, then empty the result (the round-5
    # advice fix: previously the wrong-direction hop mis-joined or threw).
    hops = []
    contradicted = False
    for i, (etype, reversed_) in enumerate(edges):
        lvar, llab, _ = nodes[i]
        rvar, rlab, _ = nodes[i + 1]
        if etype is None:
            etype, stored_rev = _infer_edge_type(llab, rlab)
        else:
            _t, src, _dst, _k = _EDGE_TABLE[etype]
            stored_rev = src != llab
        if reversed_ is not None and reversed_ != stored_rev:
            contradicted = True
        arrow = ("<-", "-") if stored_rev else ("-", "->")
        hops.append(f"({lvar}:{llab}){arrow[0]}[:{etype}]{arrow[1]}({rvar}:{rlab})")
    out = find(graph, "".join(hops))
    if contradicted:
        out = out.filter(F.lit(False))

    for var, _label, props in nodes:
        for key, val in props.items():
            out = out.filter(F.col(f"{var}_{key}") == val)

    def col_of(token: str) -> str:
        token = token.strip()
        if "." not in token:
            raise ValueError(f"RETURN items must be var.prop: {token!r}")
        var, prop = token.split(".", 1)
        return f"{var}_{prop}"

    out = out.select([F.col(col_of(t)) for t in ret.split(",")])
    if order:
        out = out.orderBy([F.col(col_of(t)) for t in order.split(",")])
    return out
